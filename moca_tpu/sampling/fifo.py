"""FIFO-Diffusion diagonal denoising engine (TPU-native).

Re-designs the reference's FIFO orchestration
(ref: scripts/evaluation/funcs.py:21-118,243-373 and funcs_mp.py:161-254):

  * the diagonal queue is a device-resident array [B, Q, h, w, C]
    (Q = f·n, + f/2 with lookahead), donated between steps,
  * the reference sweeps the 2n lookahead windows IN REVERSED RANK ORDER
    with immediate write-back (funcs.py:306-354). Because window r only
    writes slots [r·f/2 + f/2, r·f/2 + f) — strictly above every
    lower-rank read range — the sweep is exactly equivalent to processing
    all windows in parallel from a snapshot. We exploit that: all 2n
    windows (× cond/uncond for CFG) are ONE batched U-Net call, sharded
    over the device mesh. The reference needs 2·2n sequential U-Net
    launches per output frame (or one process per GPU, funcs_mp.py);
  * per-window MoCA manipulation is vmapped (sampling/moca.py),
  * the tail shift + FreeInit frequency mix (funcs.py:86-99) runs on device.

Static index maps (timesteps/indices with the lookahead prefix,
funcs.py:290-294) are precomputed in numpy inside `FIFOPlan`.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moca_tpu import freeinit
from moca_tpu.sampling.ddim import shared_normal, stochastic_encode
from moca_tpu.sampling.moca import MoCAConfig, moca_window_step
from moca_tpu.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class FIFOPlan:
    """Static window/queue geometry for a (f, n, lookahead) configuration."""

    video_length: int          # f
    num_partitions: int        # n
    lookahead: bool
    timesteps: np.ndarray      # [Q] DDPM timestep per queue slot (noisiest last)
    indices: np.ndarray        # [Q] DDIM schedule index per queue slot

    @property
    def f(self) -> int:
        return self.video_length

    @property
    def num_steps(self) -> int:
        return self.video_length * self.num_partitions

    @property
    def queue_length(self) -> int:
        return self.timesteps.shape[0]

    @property
    def num_windows(self) -> int:
        return 2 * self.num_partitions if self.lookahead else self.num_partitions

    @property
    def window_starts(self) -> np.ndarray:
        stride = self.f // 2 if self.lookahead else self.f
        return np.arange(self.num_windows) * stride

    @property
    def head_slot(self) -> int:
        """Queue slot decoded as the output frame (funcs.py:359)."""
        return self.f // 2 if self.lookahead else 0

    def window_timesteps(self) -> np.ndarray:
        """[R, f] per-window DDPM timesteps."""
        return np.stack([self.timesteps[s : s + self.f] for s in self.window_starts])

    def window_indices(self) -> np.ndarray:
        return np.stack([self.indices[s : s + self.f] for s in self.window_starts])


def make_fifo_plan(
    sch_ddim_timesteps: np.ndarray,
    video_length: int,
    num_partitions: int,
    lookahead: bool = True,
) -> FIFOPlan:
    """funcs.py:290-294: extend (timesteps, indices) with a f/2 prefix of the
    cleanest level when lookahead denoising is on."""
    f = video_length
    S = f * num_partitions
    assert sch_ddim_timesteps.shape[0] == S, "num_inference_steps must be f·n"
    timesteps = np.asarray(sch_ddim_timesteps)
    indices = np.arange(S)
    if lookahead:
        timesteps = np.concatenate([np.full(f // 2, timesteps[0]), timesteps])
        indices = np.concatenate([np.full(f // 2, 0), indices])
    return FIFOPlan(f, num_partitions, lookahead,
                    timesteps.astype(np.int64), indices.astype(np.int64))


def advance_prompt_index(i: int, num_steps: int, video_length: int,
                         cum_lengths, j: int) -> int:
    """Multi-prompt scene switching: advance the active prompt when the
    output-frame counter passes the cumulative scene length
    (funcs.py:425-431; the reference indexes past the end if lengths are
    inconsistent — we clamp)."""
    if (i - (num_steps - video_length) >= cum_lengths[j]
            and j + 1 < len(cum_lengths)):
        return j + 1
    return j


def queue_frame_indices(plan: FIFOPlan, num_source_frames: int):
    """(frame_idx[Q], ddim_idx[Q]): which source frame seeds each queue slot
    and at which DDIM noise level (funcs.py:55-77).

    Main slot i holds frame max(0, i-(S-T0)) at α_i; lookahead prepends f/2
    copies of frame 0 at α_0.
    """
    S, T0 = plan.num_steps, num_source_frames
    frame_idx = np.maximum(0, np.arange(S) - (S - T0))
    idx = np.arange(S)
    if plan.lookahead:
        frame_idx = np.concatenate([np.zeros(plan.f // 2, np.int64), frame_idx])
        idx = np.concatenate([np.zeros(plan.f // 2, np.int64), idx])
    return frame_idx, idx


def prepare_queue(
    sch: DiffusionSchedule,
    plan: FIFOPlan,
    clean_latents: jnp.ndarray,  # [B, T0, h, w, C] clean video latents
    key: jax.Array,
) -> jnp.ndarray:
    """Build the diagonal queue (funcs.py:21-82). Returns [B, Q, h, w, C]."""
    frame_idx, idx = queue_frame_indices(plan, clean_latents.shape[1])
    frames = clean_latents[:, frame_idx]  # [B, Q, h, w, C]
    noise = shared_normal(key, frames.shape).astype(frames.dtype)
    return stochastic_encode(sch, frames, jnp.asarray(idx), noise)


def shift_queue(
    latents: jnp.ndarray,
    key: jax.Array,
    anchor: Optional[jnp.ndarray] = None,
    filter_type: str = "gaussian",
    d_s: float = 0.25,
    d_t: float = 0.25,
    tail_mode: str = "freeinit",
) -> jnp.ndarray:
    """Pop head / push FreeInit-mixed tail (funcs.py:86-99).

    The new tail keeps the low frequencies of the anchor (queue slot 0 by
    default; the re-encoded last real frame in DAVIS mode) and takes the
    high frequencies of fresh noise through a gaussian LPF (d_s=d_t=0.25).

    tail_mode="plain" reproduces the multiprocess path's variant instead
    (funcs_mp.py:39-46 shift_latents): the new tail is pure fresh noise,
    no FreeInit mixing and no anchor.
    """
    if tail_mode == "plain":
        tail = shared_normal(key, latents[:, :1].shape).astype(latents.dtype)
        return jnp.concatenate([latents[:, 1:], tail], axis=1)
    if tail_mode != "freeinit":
        raise ValueError(f"unknown tail_mode {tail_mode!r}")
    if anchor is None:
        anchor = latents[:, 0]
    # anchor [B, h, w, C] — filter over (T=1,H,W) like the reference's
    # (B,C,1,H,W) path; channels-last here so the "T" axis is synthetic.
    b, h, w, c = anchor.shape
    lpf = freeinit.get_freq_filter((1, h, w), filter_type, 1, d_s, d_t)
    noise = shared_normal(key, anchor.shape).astype(anchor.dtype)
    # [B,h,w,C] -> [B,C,1,h,w] for the (T,H,W) fft axes, then back
    a = anchor.transpose(0, 3, 1, 2)[:, :, None]
    n = noise.transpose(0, 3, 1, 2)[:, :, None]
    tail = freeinit.freq_mix_3d(a, n, lpf)[:, :, 0].transpose(0, 2, 3, 1)
    return jnp.concatenate([latents[:, 1:], tail[:, None]], axis=1)


def shift_masks(masks: jnp.ndarray, new_tail: jnp.ndarray) -> jnp.ndarray:
    """DAVIS mask queue shift (funcs.py:115-116)."""
    return jnp.concatenate([masks[:, 1:], new_tail[:, None]], axis=1)


def _gather_windows(latents: jnp.ndarray, plan: FIFOPlan) -> jnp.ndarray:
    """[B, Q, ...] -> [R, B, f, ...] (static slices)."""
    return jnp.stack(
        [latents[:, s : s + plan.f] for s in plan.window_starts], axis=0
    )


def _scatter_windows(
    latents: jnp.ndarray, x_prev: jnp.ndarray, plan: FIFOPlan
) -> jnp.ndarray:
    """Write back denoised windows (funcs.py:351-354).

    Lookahead: window r commits only its less-noisy second half
    [f/2, f) → queue slots [(r+1)·f/2, (r+1)·f/2 + f/2); the halves tile
    the queue above the immutable f/2 prefix, so the update is a concat.
    """
    if plan.lookahead:
        half = plan.f // 2
        parts = [latents[:, :half]]
        parts += [x_prev[r][:, half:] for r in range(plan.num_windows)]
    else:
        parts = [x_prev[r] for r in range(plan.num_windows)]
    return jnp.concatenate(parts, axis=1)


def fifo_step(
    eps_window_fn: Callable,
    sch: DiffusionSchedule,
    plan: FIFOPlan,
    moca_cfg: MoCAConfig,
    latents: jnp.ndarray,                 # [B, Q, h, w, C]
    key: jax.Array,
    cond_image: Optional[jnp.ndarray] = None,
    masks: Optional[jnp.ndarray] = None,  # [B, Q, h, w, 1] queue-aligned
    masks_are_davis: bool = True,
    gamma: Optional[jnp.ndarray] = None,
    with_pred_x0: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """One FIFO iteration: denoise all windows, write back, return
    (new_queue, head_latent_to_decode).

    eps_window_fn: ([R·B, f, h, w, C] x, [R·B, f] t) -> eps — built by the
    pipeline with CFG fused (sampling/ddim.make_cfg_eps_fn); all windows ride
    one U-Net batch.

    with_pred_x0: additionally return the queue-aligned PRE-injection pred_x0
    (ddim.py feeds this tensor to the segmentation detector, :592-606) for
    the host-side open-vocab mask provider.

    Key layout: key → (moca_0..moca_{R-1}) per window.
    """
    R = plan.num_windows
    B = latents.shape[0]
    f = plan.f

    windows = _gather_windows(latents, plan)          # [R, B, f, h, w, C]
    w_ts = jnp.asarray(plan.window_timesteps())       # [R, f]
    w_idx = jnp.asarray(plan.window_indices())        # [R, f]

    flat_x = windows.reshape((R * B, f) + windows.shape[3:])
    flat_t = jnp.repeat(w_ts, B, axis=0).astype(jnp.int32)
    eps = eps_window_fn(flat_x, flat_t)
    eps = eps.reshape(windows.shape)

    if masks is not None:
        w_masks = _gather_windows(masks, plan)
    else:
        w_masks = None

    window_keys = jax.random.split(key, R)
    step = functools.partial(
        moca_window_step, sch, moca_cfg,
        cond_image=cond_image, masks_are_davis=masks_are_davis, gamma=gamma,
        with_preinject=True,
    )
    if w_masks is None:
        x_prev, _, pred_pre = jax.vmap(
            lambda x, e, i, t, k: step(x, e, i, t, k, masks=None)
        )(windows, eps, w_idx, w_ts, window_keys)
    else:
        x_prev, _, pred_pre = jax.vmap(
            lambda x, e, i, t, k, m: step(x, e, i, t, k, masks=m)
        )(windows, eps, w_idx, w_ts, window_keys, w_masks)

    new_latents = _scatter_windows(latents, x_prev, plan)
    head = new_latents[:, plan.head_slot]
    if with_pred_x0:
        return new_latents, head, scatter_pred_x0(pred_pre, plan)
    return new_latents, head


def scatter_pred_x0(pred: jnp.ndarray, plan: FIFOPlan) -> jnp.ndarray:
    """Queue-aligned pred_x0 from per-window pred_x0 [R, B, f, ...].

    Same tiling as `_scatter_windows`, except the lookahead prefix (queue
    slots [0, f/2), which no window commits) is taken from window 0's FIRST
    half — the reference's per-frame segmentation sees those frames as part
    of window 0's sweep (funcs.py:306 processes every slot of every window).
    """
    if plan.lookahead:
        half = plan.f // 2
        parts = [pred[0][:, :half]]
        parts += [pred[r][:, half:] for r in range(plan.num_windows)]
    else:
        parts = [pred[r] for r in range(plan.num_windows)]
    return jnp.concatenate(parts, axis=1)
