"""Capture a device trace of the FIFO iteration and print the op-level
time breakdown (framework-op table via tensorboard_plugin_profile).

Usage: python scripts/profile_fifo.py [t2v|fifo]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def capture(mode: str = "fifo", trace_dir: str = "/tmp/moca_trace"):
    import jax.numpy as jnp
    import numpy as np

    import bench

    # Build the same setup as bench_fifo but trace a single iteration.
    from moca_tpu.models.unet3d import UNet3D, UNetConfig
    from moca_tpu.sampling.ddim import make_cfg_eps_fn
    from moca_tpu.sampling.fifo import fifo_step, make_fifo_plan, shift_queue
    from moca_tpu.sampling.moca import MoCAConfig
    from moca_tpu.schedule import make_schedule

    dtype = jnp.bfloat16
    ucfg = UNetConfig(dtype=dtype, param_dtype=dtype)
    unet = UNet3D(ucfg)
    f, n = 16, 4
    H, W = 40, 64
    sch = make_schedule(ddim_num_steps=f * n, ddim_eta=1.0)
    plan = make_fifo_plan(np.asarray(sch.ddim_timesteps), f, n, True)
    x = jnp.zeros((1, f, H, W, 4), jnp.float32)
    ts = jnp.zeros((1, f), jnp.int32)
    ctx = jnp.zeros((1, 77, ucfg.context_dim), jnp.float32)
    shapes = jax.eval_shape(lambda k: unet.init(k, x, ts, ctx, fps=16),
                            jax.random.PRNGKey(0))
    params = bench._random_params_like(shapes, jax.random.PRNGKey(1))
    uc = jnp.zeros_like(ctx)

    def unet_apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    from moca_tpu.xla_opts import tuned_jit

    @tuned_jit
    def iteration(p, latents, key):
        eps_fn = make_cfg_eps_fn(unet_apply, p, ctx, uc, 12.0)
        k1, k2 = jax.random.split(key)
        new_latents, head = fifo_step(
            eps_fn, sch, plan, MoCAConfig(), latents, k1,
            cond_image=jnp.full((H, W, 4), 0.2))
        return shift_queue(new_latents, k2), head

    latents = jax.random.normal(
        jax.random.PRNGKey(3), (1, plan.queue_length, H, W, 4))
    # warm up / compile
    latents, head = iteration(params, latents, jax.random.PRNGKey(4))
    jax.block_until_ready(head)

    jax.profiler.start_trace(trace_dir)
    latents, head = iteration(params, latents, jax.random.PRNGKey(5))
    jax.block_until_ready(head)
    jax.profiler.stop_trace()
    return trace_dir


def summarize(trace_dir: str, top: int = 30):
    from tensorboard_plugin_profile.convert import raw_to_tool_data as rtd

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True))
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = rtd.xspace_to_tool_data([paths[-1]], "framework_op_stats", {})
    # data is CSV-ish or json depending on version
    out_path = os.path.join(trace_dir, "op_stats.txt")
    payload = data.decode() if isinstance(data, bytes) else str(data)
    with open(out_path, "w") as fh:
        fh.write(payload)
    print(f"wrote {out_path} ({len(payload)} bytes)")
    # quick print of the head
    for line in payload.splitlines()[:top]:
        print(line[:220])


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "fifo"
    d = capture(mode)
    try:
        summarize(d)
    except Exception as e:  # plugin API drift — keep the raw trace
        print(f"summarize failed ({e}); raw trace at {d}")
