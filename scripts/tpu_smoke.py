"""Flagship-shape product-path smoke on the real TPU chip.

Runs the ACTUAL `MoCAVideoPipeline` (not bench.py's re-assembled loop) at
512×320 / f=16 / n=4 with random bf16 weights: base 64-step DDIM sample →
latent cache → full FIFO+MoCA stream with concept injection → decoded
frames. Prints one JSON line with per-frame product-path timing and the
StepTimer stage breakdown.

Usage: python scripts/tpu_smoke.py [new_video_length=4]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
os.environ.setdefault("MOCA_TPU_PROFILE", "1")


def build_model():
    """Flagship-config model with random bf16 weights via eval_shape
    (init-by-tracing would pay a full remote compile of the initializers)."""
    import bench

    from moca_tpu.models.clip_text import CLIPTextEncoder, CLIPTextConfig
    from moca_tpu.models.latent_diffusion import LatentDiffusion
    from moca_tpu.models.unet3d import UNet3D, UNetConfig
    from moca_tpu.models.vae import AutoencoderKL, VAEConfig

    dtype = jnp.bfloat16
    ucfg = UNetConfig(dtype=dtype, param_dtype=dtype)
    vcfg = VAEConfig(dtype=dtype, param_dtype=dtype)
    ccfg = CLIPTextConfig(dtype=dtype, param_dtype=dtype)
    unet, vae, clip = (UNet3D(ucfg), AutoencoderKL(vcfg),
                      CLIPTextEncoder(ccfg))

    x = jnp.zeros((1, 16, 40, 64, 4), jnp.float32)
    ts = jnp.zeros((1, 16), jnp.int32)
    ctx = jnp.zeros((1, 77, ucfg.context_dim), jnp.float32)
    ushapes = jax.eval_shape(lambda k: unet.init(k, x, ts, ctx, fps=16),
                             jax.random.PRNGKey(0))
    vshapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, 320, 512, 3))),
        jax.random.PRNGKey(0))
    cshapes = jax.eval_shape(
        lambda k: clip.init(k, jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0))
    up = bench._random_params_like(ushapes, jax.random.PRNGKey(1))
    vp = bench._random_params_like(vshapes, jax.random.PRNGKey(2))
    cp = bench._random_params_like(cshapes, jax.random.PRNGKey(3))
    return LatentDiffusion(ucfg, vcfg, ccfg, up, vp, cp)


def main():
    from moca_tpu.models.tokenizer import HashTokenizer
    from moca_tpu.pipelines.moca_video import MoCAVideoPipeline

    new_len = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    model = build_model()
    pipe = MoCAVideoPipeline(
        model, HashTokenizer(), video_length=16, num_partitions=4,
        new_video_length=new_len, guidance_scale=12.0)
    cond = np.full((40, 64, 4), 0.2, np.float32)

    t0 = time.perf_counter()
    frames = pipe("a cat surfing", jax.random.PRNGKey(321),
                  cond_image=cond, conditioned_prompt="a dog",
                  gamma=0.5, height=320, width=512)
    total = time.perf_counter() - t0
    n = len(frames)
    print(json.dumps({
        "metric": "product-path MoCAVideoPipeline flagship smoke "
                  "(base 64-step DDIM + full FIFO stream, incl. compiles)",
        "frames": n,
        "total_s": round(total, 1),
        "s_per_frame_incl_compile": round(total / n, 2),
        "finite": bool(all(np.isfinite(f).all() for f in frames)),
        "frame_shape": list(frames[0].shape),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
