"""Driver-captured benchmark on one real TPU chip.

Primary metric (the product path): **sec per output frame of the full MoCA
FIFO iteration** at flagship shape — f=16 frames × n=4 partitions with
lookahead → 8 windows × 2 CFG = one batch-16-window U-Net call + MoCA scan +
queue shift + head decode, bf16, random weights (identical FLOPs/memory
traffic to converted weights). Secondary fields carry the T2V clip metric
(BASELINE.md north star: < 30 s / 16-frame 512×320 50-step clip on v5e-8)
and an MFU estimate from the compiled HLO's flop count.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}
vs_baseline = 30 s / (16 × sec_per_frame): >1 ⇒ a 16-frame slice of the
FIFO stream beats the 30 s clip target.

BENCH_MODE=fifo|t2v limits the run to one section (default: both).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from moca_tpu.xla_opts import tuned_jit

# Persistent compilation cache: first-ever compile of the 1.4B U-Net is
# minutes on this host; subsequent bench runs (incl. the driver's) hit the
# cache and only pay execution time.
_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

STEPS = int(os.environ.get("BENCH_STEPS", "50"))
FRAMES = 16
H, W = 40, 64  # 512×320 → /8
BASELINE_SECONDS = 30.0

# bf16 peak per chip, for the MFU estimate (public figures)
_PEAK_FLOPS = {
    "TPU v5 lite": 197e12,   # v5e
    "TPU v5": 459e12,        # v5p
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,   # v6e / Trillium
}


def _peak_flops(device) -> float:
    kind = getattr(device, "device_kind", str(device))
    for prefix, peak in sorted(_PEAK_FLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(prefix):
            return peak
    return 197e12


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


def _flagship_models():
    from moca_tpu.models.unet3d import UNet3D, UNetConfig
    from moca_tpu.models.vae import AutoencoderKL, VAEConfig

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
    return unet, vae, ucfg, uparams, vparams, ctx


def _maybe_compile_with_opts(jitted, *args):
    """BENCH_XLA_OPTS="k=v;k=v" → compile with explicit XLA options.

    XLA_FLAGS can't carry TPU flags here (the local CPU XLA parses and
    rejects them; compilation happens on the remote axon service), but
    per-compile `compiler_options` DO pass through — this is the flag-sweep
    hook the perf notes use."""
    opts = os.environ.get("BENCH_XLA_OPTS")
    if not opts:
        return jitted
    kv = dict(p.split("=", 1) for p in opts.split(";") if p)
    return jitted.lower(*args).compile(compiler_options=kv)


def _hlo_flops(jitted, *args) -> float:
    """Total flops of the compiled program (0 when the backend doesn't
    expose cost analysis, e.g. some remote-compile paths)."""
    try:
        if hasattr(jitted, "lower"):
            jitted = jitted.lower(*args).compile()
        cost = jitted.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_fifo() -> dict:
    """sec per output frame of the full MoCA FIFO iteration at flagship
    shape (f=16, n=4 lookahead → 8 windows ×2 CFG = one batch-256-frame
    U-Net call + MoCA scan + shift + head decode)."""
    from moca_tpu.sampling.ddim import make_cfg_eps_fn
    from moca_tpu.sampling.fifo import fifo_step, make_fifo_plan, shift_queue
    from moca_tpu.sampling.moca import MoCAConfig
    from moca_tpu.schedule import make_schedule

    unet, vae, ucfg, uparams, vparams, ctx = _flagship_models()
    f, n = 16, 4
    sch = make_schedule(ddim_num_steps=f * n, ddim_eta=1.0)
    plan = make_fifo_plan(np.asarray(sch.ddim_timesteps), f, n, True)
    uc = jnp.zeros_like(ctx)
    cond_image = jnp.full((H, W, 4), 0.2)

    def unet_apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    @tuned_jit
    def iteration(params, latents, key):
        eps_fn = make_cfg_eps_fn(unet_apply, params, ctx, uc, 12.0)
        k1, k2 = jax.random.split(key)
        new_latents, head = fifo_step(
            eps_fn, sch, plan, MoCAConfig(), latents, k1,
            cond_image=cond_image)
        return shift_queue(new_latents, k2), head

    @tuned_jit
    def decode(params, heads):
        return vae.apply(params, heads, method=vae.decode)

    latents = jax.random.normal(
        jax.random.PRNGKey(3), (1, plan.queue_length, H, W, 4))
    n_runs = int(os.environ.get("BENCH_RUNS", "4"))
    iteration = _maybe_compile_with_opts(
        iteration, uparams, latents, jax.random.PRNGKey(4))
    t0 = time.perf_counter()
    latents, head = iteration(uparams, latents, jax.random.PRNGKey(4))
    # warm the decode at the BATCHED shape the timed loop uses — otherwise
    # a fresh batch-n VAE compile lands inside the timed region
    frame = decode(vparams, jnp.concatenate([head] * n_runs, axis=0))
    jax.block_until_ready(frame)
    compile_s = time.perf_counter() - t0
    heads = []
    t0 = time.perf_counter()
    for i in range(n_runs):
        latents, head = iteration(uparams, latents, jax.random.PRNGKey(5 + i))
        heads.append(head)
    frames = decode(vparams, jnp.concatenate(heads, axis=0))
    jax.block_until_ready(frames)
    sec_per_frame = (time.perf_counter() - t0) / n_runs

    out = {
        "metric": "sec per output frame, full MoCA FIFO iteration "
                  "(f=16 n=4 lookahead, 8 windows, CFG, bf16, 1 chip)",
        "value": round(sec_per_frame, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / (sec_per_frame * 16), 3),
        "fifo_compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }
    flops = _hlo_flops(iteration, uparams, latents, jax.random.PRNGKey(9))
    if flops:
        peak = _peak_flops(jax.devices()[0])
        out["fifo_iteration_tflops"] = round(flops / 1e12, 1)
        out["mfu_pct"] = round(100.0 * flops / (sec_per_frame * peak), 1)
    try:
        # absent through the axon tunnel device; populated on
        # directly-attached TPUs
        stats = jax.devices()[0].memory_stats() or {}
        if "peak_bytes_in_use" in stats:
            out["hbm_peak_gb"] = round(stats["peak_bytes_in_use"] / 2**30, 2)
    except Exception:
        pass
    return out


def bench_fifo_seg() -> dict:
    """The open-vocab product variant of the FIFO step: queue masks +
    concept injection active AND with_pred_x0=True — the pre-injection
    pred_x0 of the t≤300 queue slots is returned and transferred to host
    every iteration (what feeds the mask provider,
    pipelines/moca_video.py:_pull_masks), and the provider's refreshed mask
    queue is re-uploaded. Compiles a different HLO than bench_fifo
    (pred-x0 scatter, mask gather/injection); this measures its cost as a
    driver-visible number instead of an inference from tpu_smoke."""
    from moca_tpu.sampling.ddim import make_cfg_eps_fn
    from moca_tpu.sampling.fifo import fifo_step, make_fifo_plan, shift_queue
    from moca_tpu.sampling.moca import MoCAConfig
    from moca_tpu.schedule import make_schedule

    unet, vae, ucfg, uparams, vparams, ctx = _flagship_models()
    f, n = 16, 4
    sch = make_schedule(ddim_num_steps=f * n, ddim_eta=1.0)
    plan = make_fifo_plan(np.asarray(sch.ddim_timesteps), f, n, True)
    uc = jnp.zeros_like(ctx)
    cond_image = jnp.full((H, W, 4), 0.2)
    moca = MoCAConfig()
    k_low = int(np.sum(plan.timesteps <= moca.inject_threshold))

    def unet_apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    @tuned_jit
    def iteration(params, latents, masks, key):
        eps_fn = make_cfg_eps_fn(unet_apply, params, ctx, uc, 12.0)
        k1, k2 = jax.random.split(key)
        new_latents, head, pred = fifo_step(
            eps_fn, sch, plan, moca, latents, k1,
            cond_image=cond_image, masks=masks, masks_are_davis=False,
            with_pred_x0=True)
        return shift_queue(new_latents, k2), head, pred[:, :k_low]

    latents = jax.random.normal(
        jax.random.PRNGKey(3), (1, plan.queue_length, H, W, 4))
    masks = (jax.random.uniform(
        jax.random.PRNGKey(6), (1, plan.queue_length, H, W, 1)) > 0.5
    ).astype(jnp.float32)
    n_runs = int(os.environ.get("BENCH_RUNS", "4"))
    t0 = time.perf_counter()
    latents, head, pred = iteration(uparams, latents, masks,
                                    jax.random.PRNGKey(4))
    jax.block_until_ready((latents, head, pred))
    compile_s = time.perf_counter() - t0
    mask_np = np.asarray(masks)
    # warm the host round-trip path (pred readback program + mask upload)
    # before timing — the r5 on-chip run showed the first timed loop ~0.25
    # s/frame above identical later loops when it started this path cold
    _ = np.asarray(pred)
    masks = jnp.asarray(mask_np)
    latents, head, pred = iteration(uparams, latents, masks,
                                    jax.random.PRNGKey(4))
    _ = np.asarray(pred)
    masks = jnp.asarray(mask_np)
    jax.block_until_ready(head)
    t0 = time.perf_counter()
    for i in range(n_runs):
        latents, head, pred = iteration(uparams, latents, masks,
                                        jax.random.PRNGKey(7 + i))
        # host round trip the product pipeline pays per iteration: pred_x0
        # slots down (provider input), refreshed mask queue up
        _ = np.asarray(pred)
        masks = jnp.asarray(mask_np)
    jax.block_until_ready(head)
    sec_per_frame = (time.perf_counter() - t0) / n_runs

    # the PRODUCT default schedule (seg_async=True, zero-cost detector):
    # dispatch iteration i+1 BEFORE synchronizing on iteration i's pred —
    # what a pipeline user actually pays per open-vocab frame (the
    # sec_per_frame loop above is the sync-shaped schedule, kept as the
    # cross-round-comparable headline field)
    prev = None
    t0 = time.perf_counter()
    for i in range(n_runs):
        latents, head, pred = iteration(uparams, latents, masks,
                                        jax.random.PRNGKey(31 + i))
        if prev is not None:
            _ = np.asarray(prev)
            masks = jnp.asarray(mask_np)
        prev = pred
    # drain: final pred readback AND mask upload — same per-frame host
    # round-trip count as the sync loop, so the async-vs-sync delta is
    # pure scheduling, not one elided ~737 KB tunnel upload
    _ = np.asarray(prev)
    masks = jnp.asarray(mask_np)
    jax.block_until_ready((head, masks))
    async_spf = (time.perf_counter() - t0) / n_runs

    # --- detector-overlap proof (MoCAVideoPipeline.seg_async): the product
    # pipeline dispatches iteration i+1 BEFORE synchronizing on iteration
    # i's pred_x0, so a slow open-vocab detector runs while the device
    # computes. Emulate both schedules around the same jitted iteration
    # with a deliberately slow (50 ms/slot-batch) fake detector; hidden_pct
    # reports how much of the added detector time the async schedule hides.
    sleep_s = float(os.environ.get("BENCH_SEG_SLEEP", "0.05"))
    t0 = time.perf_counter()
    for i in range(n_runs):  # sync: sync pred → detect → dispatch next
        latents, head, pred = iteration(uparams, latents, masks,
                                        jax.random.PRNGKey(11 + i))
        _ = np.asarray(pred)
        time.sleep(sleep_s)
        masks = jnp.asarray(mask_np)
    jax.block_until_ready(head)
    slow_sync_spf = (time.perf_counter() - t0) / n_runs
    prev = None
    t0 = time.perf_counter()
    for i in range(n_runs):  # async: dispatch next → sync PREVIOUS → detect
        latents, head, pred = iteration(uparams, latents, masks,
                                        jax.random.PRNGKey(15 + i))
        if prev is not None:
            _ = np.asarray(prev)
            time.sleep(sleep_s)
            masks = jnp.asarray(mask_np)
        prev = pred
    _ = np.asarray(prev)
    time.sleep(sleep_s)  # drain — same detector-call count as sync
    jax.block_until_ready(head)
    slow_async_spf = (time.perf_counter() - t0) / n_runs
    # hidden_pct = saved-time / detector-sleep. Values > 100 % are
    # expected: the async schedule hides the detector sleep AND the
    # pred_x0 device→host readback + sync that the sync schedule pays
    # serially (the raw slow_{sync,async}_spf fields carry the absolutes).
    # BENCH_SEG_SLEEP=0 disables the artificial detector → nothing to hide.
    hidden_pct = (100.0 * (slow_sync_spf - slow_async_spf) / sleep_s
                  if sleep_s > 0 else 0.0)

    return {
        "fifo_seg_sec_per_frame": round(sec_per_frame, 3),
        "fifo_seg_async_spf": round(async_spf, 3),
        "fifo_seg_pred_slots": k_low,
        "fifo_seg_compile_s": round(compile_s, 1),
        "fifo_seg_slow_sync_spf": round(slow_sync_spf, 3),
        "fifo_seg_slow_async_spf": round(slow_async_spf, 3),
        "fifo_seg_detector_sleep_s": sleep_s,
        "fifo_seg_async_hidden_pct": round(hidden_pct, 1),
    }


def bench_t2v() -> dict:
    from moca_tpu.sampling.ddim import ddim_sample, make_cfg_eps_fn
    from moca_tpu.schedule import make_schedule

    unet, vae, ucfg, uparams, vparams, ctx = _flagship_models()
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=1.0)
    uc = jnp.zeros_like(ctx)

    def unet_apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    # NOTE: params are explicit jit arguments — closed-over weight trees
    # would be baked into the HLO as constants (GBs shipped to the remote
    # compiler under axon).
    @tuned_jit
    def sample(params, key):
        eps_fn = make_cfg_eps_fn(unet_apply, params, ctx, uc, 12.0)
        latents, _ = ddim_sample(eps_fn, sch, (1, FRAMES, H, W, 4), key)
        return latents

    @tuned_jit
    def decode(params, latents):
        flat = latents.reshape((FRAMES, H, W, 4))
        return vae.apply(params, flat, method=vae.decode)

    t0 = time.perf_counter()
    lat = sample(uparams, jax.random.PRNGKey(0))
    frames = decode(vparams, lat)
    jax.block_until_ready(frames)
    compile_s = time.perf_counter() - t0

    n_runs = int(os.environ.get("BENCH_RUNS", "3"))
    times = []
    for i in range(n_runs):
        t0 = time.perf_counter()
        lat = sample(uparams, jax.random.PRNGKey(i + 1))
        frames = decode(vparams, lat)
        jax.block_until_ready(frames)
        times.append(time.perf_counter() - t0)
    sec_per_clip = min(times)
    return {
        "t2v_clip_s": round(sec_per_clip, 3),
        "t2v_vs_baseline": round(BASELINE_SECONDS / sec_per_clip, 3),
        "t2v_steps_per_sec_per_chip": round(STEPS / sec_per_clip, 3),
        "t2v_compile_s": round(compile_s, 1),
    }


def _probe_backend(timeout_s: float = 240.0) -> bool:
    """True iff the TPU backend answers within `timeout_s`.

    The axon tunnel (the one real chip) goes down for hours at a time, and
    `jax.devices()` then HANGS indefinitely — which would make the driver's
    bench run hang instead of recording an honest failure. Probe from a
    subprocess so the hang is bounded."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    """Timeout-proof protocol (round-5, after BENCH_r04 rc=124):

    The driver parses the LAST JSON line of the tail, under an external
    timeout. So: print the primary FIFO line the moment bench_fifo()
    returns, then try to improve it — each later section re-prints the
    MERGED line, overwriting the earlier one from the driver's point of
    view. A timeout mid-section then loses only that section, never the
    primary number. BENCH_BUDGET_S (default 900) is a wall clock: a
    section only starts if the budget has room for its worst-case cold
    compile (observed r3: fifo 124 s, fifo_seg 125 s, t2v 163 s) plus
    execution; skipped sections are listed in `sections_skipped`."""
    mode = os.environ.get("BENCH_MODE", "all")
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))
    start = time.monotonic()
    if not _probe_backend():
        print(json.dumps({
            "metric": "sec per output frame, full MoCA FIFO iteration "
                      "(f=16 n=4 lookahead, bf16, 1 chip)",
            "value": None,
            "unit": "s",
            "vs_baseline": None,
            "error": "TPU backend unreachable (probe timed out) — the axon "
                     "tunnel is down; the stale_* fields repeat the last "
                     "fresh-process on-chip measurement, they are NOT from "
                     "this run",
            "stale_fifo_sec_per_frame": 1.800,
            "stale_t2v_clip_s": 11.642,
            "stale_source": "docs/ROUND5.md final HEAD bench (all three "
                            "sections fresh in one driver-equivalent run: "
                            "fifo 1.800 MFU 58.9, seg 1.931, t2v 11.642)",
        }))
        return
    if mode == "t2v":
        t2v = bench_t2v()
        result = {
            "metric": f"sec per {FRAMES}-frame 512x320 clip ({STEPS} DDIM "
                      "steps, CFG, bf16, 1 chip)",
            "value": t2v["t2v_clip_s"],
            "unit": "s",
            "vs_baseline": t2v["t2v_vs_baseline"],
            "device": str(jax.devices()[0]),
            **t2v,
        }
    elif mode == "fifo":
        result = bench_fifo()
    elif mode == "fifo_seg":
        result = bench_fifo_seg()
        result.update({"metric": "sec per output frame, open-vocab FIFO "
                                 "variant (masks+injection+pred_x0)",
                       "value": result["fifo_seg_sec_per_frame"],
                       "unit": "s"})
    else:
        try:
            result = bench_fifo()
        except Exception as e:  # noqa: BLE001 — an honest error beats rc-only
            print(json.dumps({
                "metric": "sec per output frame, full MoCA FIFO iteration "
                          "(f=16 n=4 lookahead, bf16, 1 chip)",
                "value": None, "unit": "s", "vs_baseline": None,
                "error": f"bench_fifo raised: {e!r}",
                "stale_fifo_sec_per_frame": 1.800,
                "stale_source": "docs/ROUND5.md final HEAD bench"}),
                flush=True)
            raise
        # Primary number is now safe: emit it BEFORE attempting anything
        # else, so an external timeout in a later section can't erase it.
        print(json.dumps(result), flush=True)
        skipped = []
        # Worst-case section costs (cold compile + exec, r3/r4 receipts).
        section_cost = {"fifo_seg": 180.0, "t2v": 220.0}

        def room_for(name):
            if time.monotonic() - start + section_cost[name] <= budget_s:
                return True
            skipped.append(name)
            return False

        if room_for("fifo_seg"):
            try:
                result.update(bench_fifo_seg())
                result["fifo_seg_overhead_pct"] = round(
                    100.0 * (result["fifo_seg_sec_per_frame"]
                             / result["value"] - 1.0), 1)
            except Exception as e:  # noqa: BLE001 — keep the primary line
                result["fifo_seg_error"] = repr(e)
            print(json.dumps(result), flush=True)
        if room_for("t2v"):
            try:
                result.update(bench_t2v())
            except Exception as e:  # noqa: BLE001
                result["t2v_error"] = repr(e)
        if skipped:
            result["sections_skipped"] = skipped
            result["budget_s"] = budget_s
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
