"""Device mesh + sharding for multi-chip FIFO denoising.

TPU-native replacement for the reference's multi-GPU designs:
  * NCCL DDP prompt sharding (ref: scripts/evaluation/ddp_wrapper.py:8-46)
    → host-level prompt slicing + `jax.distributed` (no collectives needed),
  * one-process-per-GPU FIFO partition parallelism with torch.multiprocessing
    queues (ref: scripts/evaluation/funcs_mp.py:161-254) → the window batch
    of the jitted FIFO step is sharded over the mesh with
    `with_sharding_constraint`; XLA inserts the (tiny) collectives on ICI.

Mesh axes:
  "dp"   — data parallel over the video batch (independent prompts/clips)
  "fifo" — the 2n diagonal-denoising windows of one FIFO step

The U-Net batch for one FIFO step is [2·R·B] (windows × interleaved
cond/uncond CFG); rows are laid out (window-major, cfg-minor) so sharding
axis 0 by ("fifo","dp") gives each device whole cond+uncond pairs — the CFG
combine and the MoCA math stay collective-free; only the U-Net's activations
ride ICI if XLA chooses to shard internals.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("dp", "fifo"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh over all (or given) devices; default puts everything on "fifo"."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axes=("fifo", "dp")):
    """Sharding for a flat window/CFG batch on axis 0."""
    return NamedSharding(mesh, P(axes))


def make_sharded_unet_apply(unet_apply, mesh: Mesh,
                            batch_axes=("fifo", "dp"),
                            skip_indivisible: bool = False):
    """Wrap a U-Net apply fn with batch-axis sharding constraints.

    Inputs/outputs are constrained to shard their leading (window·cfg·batch)
    axis across the mesh; parameters stay replicated (the 1.4B U-Net fits
    per chip — SURVEY §2.5: no tensor parallelism needed; add activation
    sharding here if a bigger model family lands).

    skip_indivisible: pass batches whose leading axis doesn't tile the mesh
    through unconstrained (trace-time check) — used by the T2V path, where
    the CFG batch is 2·B prompt rows and B is user-chosen, unlike the FIFO
    window batch whose geometry is pinned to the mesh.
    """
    s = NamedSharding(mesh, P(batch_axes))

    def apply(params, x, t_frames, context, fps=16, **kw):
        if skip_indivisible and x.shape[0] % mesh.size:
            return unet_apply(params, x, t_frames, context, fps, **kw)
        x = jax.lax.with_sharding_constraint(x, s)
        t_frames = jax.lax.with_sharding_constraint(t_frames, s)
        context = jax.lax.with_sharding_constraint(context, s)
        out = unet_apply(params, x, t_frames, context, fps, **kw)
        return jax.lax.with_sharding_constraint(out, s)

    return apply


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None):
    """Multi-host init (replaces ddp_wrapper.py's NCCL env:// init)."""
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
