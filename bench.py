"""Benchmark: sec per 16-frame 512×320 clip (50 DDIM steps) on one chip.

North star (BASELINE.md): < 30 s on v5e-8 for the full concept-mixed clip;
tracked metrics = sec/clip and U-Net denoise steps/sec/chip. This bench
measures the dominant cost — the CFG'd U-Net denoise loop at the flagship
shape plus the per-frame VAE decode — with random bf16 weights (identical
FLOPs/memory traffic to converted weights).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}
vs_baseline = baseline_seconds / measured_seconds (>1 ⇒ faster than the
30 s target).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

STEPS = int(os.environ.get("BENCH_STEPS", "50"))
FRAMES = 16
H, W = 40, 64  # 512×320 → /8
BASELINE_SECONDS = 30.0


def _random_params_like(shapes, key, scale=0.02):
    leaves, treedef = jax.tree.flatten(shapes)
    keys = jax.random.split(key, len(leaves))
    vals = [
        jax.random.normal(k, l.shape, l.dtype) * scale
        if jnp.issubdtype(l.dtype, jnp.floating)
        else jnp.zeros(l.shape, l.dtype)
        for k, l in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, vals)


def main():
    from moca_tpu.models.unet3d import UNet3D, UNetConfig
    from moca_tpu.models.vae import AutoencoderKL, VAEConfig
    from moca_tpu.sampling.ddim import ddim_sample, make_cfg_eps_fn
    from moca_tpu.schedule import make_schedule

    dtype = jnp.bfloat16
    ucfg = UNetConfig(dtype=dtype, param_dtype=dtype)
    vcfg = VAEConfig(dtype=dtype, param_dtype=dtype)
    unet = UNet3D(ucfg)
    vae = AutoencoderKL(vcfg)

    x = jnp.zeros((1, FRAMES, H, W, 4), jnp.float32)
    ts = jnp.zeros((1, FRAMES), jnp.int32)
    ctx = jnp.zeros((1, 77, ucfg.context_dim), jnp.float32)
    ushapes = jax.eval_shape(lambda k: unet.init(k, x, ts, ctx, fps=16),
                             jax.random.PRNGKey(0))
    uparams = _random_params_like(ushapes, jax.random.PRNGKey(1))
    vshapes = jax.eval_shape(
        lambda k: vae.init(k, jnp.zeros((1, H * 8, W * 8, 3))),
        jax.random.PRNGKey(0))
    vparams = _random_params_like(vshapes, jax.random.PRNGKey(2))

    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=1.0)
    uc = jnp.zeros_like(ctx)

    def unet_apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    eps_fn = make_cfg_eps_fn(unet_apply, uparams, ctx, uc, 12.0)

    @jax.jit
    def sample(key):
        latents, _ = ddim_sample(eps_fn, sch, (1, FRAMES, H, W, 4), key)
        return latents

    @jax.jit
    def decode(latents):
        flat = latents.reshape((FRAMES, H, W, 4))
        return vae.apply(vparams, flat, method=vae.decode)

    # compile
    t0 = time.perf_counter()
    lat = sample(jax.random.PRNGKey(0))
    frames = decode(lat)
    jax.block_until_ready(frames)
    compile_s = time.perf_counter() - t0

    # timed runs
    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        lat = sample(jax.random.PRNGKey(i + 1))
        frames = decode(lat)
        jax.block_until_ready(frames)
        times.append(time.perf_counter() - t0)
    sec_per_clip = min(times)
    steps_per_sec = STEPS / sec_per_clip

    print(json.dumps({
        "metric": f"sec per {FRAMES}-frame 512x320 clip ({STEPS} DDIM steps, "
                  f"CFG, bf16, 1 chip)",
        "value": round(sec_per_clip, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / sec_per_clip, 3),
        "steps_per_sec_per_chip": round(steps_per_sec, 3),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
