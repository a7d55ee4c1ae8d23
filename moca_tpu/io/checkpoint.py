"""Flax checkpoint persistence (convert once, load fast).

The reference re-loads the 5.6 GB torch .ckpt every run
(funcs.py:487-503). Here `convert` is a one-time step: the converted Flax
trees are saved with orbax (tensorstore-backed, memory-mappable) and the CLI
loads them directly on subsequent runs.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple


def save_flax_checkpoint(path: str, trees: Dict[str, Any]):
    """trees: {"unet": params, "vae": params, "clip": params, ...}."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, trees)
    ckptr.wait_until_finished()


def load_flax_checkpoint(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def load_or_convert(ckpt_path: str, unet_cfg, vae_cfg, clip_cfg,
                    cache_dir: str | None = None) -> Tuple[Any, Any, Any]:
    """Load the orbax cache next to the torch ckpt (or convert + write it).

    cache invalidation is by torch-ckpt mtime embedded in the cache name.
    """
    from moca_tpu.models.convert import convert_checkpoint

    if cache_dir is None:
        cache_dir = os.path.dirname(os.path.abspath(ckpt_path))
    mtime = int(os.path.getmtime(ckpt_path))
    cache = os.path.join(cache_dir,
                         f".moca_tpu_flax_{os.path.basename(ckpt_path)}_{mtime}")
    if os.path.isdir(cache):
        trees = load_flax_checkpoint(cache)
        return trees["unet"], trees["vae"], trees["clip"]
    unet_p, vae_p, clip_p = convert_checkpoint(
        ckpt_path, unet_cfg, vae_cfg, clip_cfg)
    try:
        save_flax_checkpoint(cache, {"unet": unet_p, "vae": vae_p,
                                     "clip": clip_p})
    except Exception:
        pass  # cache write is best-effort (read-only dirs)
    return unet_p, vae_p, clip_p
