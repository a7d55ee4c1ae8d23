"""Base DDIM sampler as a jitted lax.scan.

Re-implements the reference's full-video DDIM loop
(ref: lvdm/models/samplers/ddim.py:182-359) TPU-first:
  * the python step loop becomes `lax.scan` over a step index, gathering
    per-step (α, α_prev, σ, scale) from the DiffusionSchedule buffers,
  * classifier-free guidance runs cond+uncond in ONE batched U-Net forward
    (the reference issues two sequential calls, ddim.py:295-299),
  * `use_scale` latent-rescale correction included (ddim.py:349-355),
  * explicit PRNG key threading (the reference relies on torch global RNG).

The denoiser is injected as `eps_fn(x, t_frames) -> eps` where t_frames is
[B, T] — the same signature serves uniform and FIFO-diagonal noise levels.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from moca_tpu.schedule import DiffusionSchedule


def shared_normal(key, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Normal noise SHARED across the leading batch axis.

    Batched prompts (B>1 data parallelism) must reproduce the B=1 stream
    bit-for-bit: the reference's DDP ranks all call seed_everything with the
    same seed (videocrafter_main.py:62, ddp_wrapper.py), so concurrently
    processed prompts consume identical noise. Drawing [1, ...] and
    broadcasting keeps B=1 draws bit-identical to before and makes one
    B-batched run equal B single-prompt runs."""
    one = jax.random.normal(key, (1,) + tuple(shape[1:]), dtype)
    return jnp.broadcast_to(one, shape)


def expand_context(context: jnp.ndarray, rows: int) -> jnp.ndarray:
    """Per-row conditioning for a flat window batch.

    FIFO flattens windows ROW-MAJOR over (window, prompt) — see
    fifo.fifo_step — so a [B, L, D] multi-prompt context tiles along axis 0
    (prompt-minor) to cover rows = R·B; a [1, L, D] context broadcasts."""
    bc = context.shape[0]
    if bc == rows:
        return context
    if bc == 1:
        return jnp.broadcast_to(context, (rows,) + context.shape[1:])
    assert rows % bc == 0, (rows, bc)
    return jnp.tile(context, (rows // bc,) + (1,) * (context.ndim - 1))


def make_cfg_eps_fn(
    unet_apply: Callable,
    params,
    context: jnp.ndarray,
    uncond_context: Optional[jnp.ndarray],
    guidance_scale: float,
    fps=16,
    uc_type: Optional[str] = None,
    temporal_guidance_scale: Optional[float] = None,
) -> Callable:
    """Build eps_fn with classifier-free guidance fused into one forward.

    Stacks [cond | uncond] on the batch axis — one U-Net call, MXU-friendly
    (vs ddim.py:295-299's two sequential calls).

    uc_type: None (standard CFG) | 'cfg_original' | 'cfg_ours'
    (ddim.py:303-311). temporal_guidance_scale adds
    s_t·(e_temporal − e_no_temporal_attn) (ddim.py:313-316) — implemented
    with the temporal layers actually skipped; the reference drops the
    `no_temporal_attn` flag on the floor (DECISIONS.md), making its
    temporal CFG a silent no-op.
    """

    def combine(e_c, e_u):
        if uc_type is None:
            return e_u + guidance_scale * (e_c - e_u)
        if uc_type == "cfg_original":
            return e_c + guidance_scale * (e_c - e_u)
        if uc_type == "cfg_ours":
            return e_c + guidance_scale * (e_u - e_c)
        raise NotImplementedError(uc_type)

    def temporal_term(x, t_frames):
        if temporal_guidance_scale is None:
            return None
        ctx = expand_context(context, x.shape[0])
        e_t = unet_apply(params, x, t_frames, ctx, fps)
        e_i = unet_apply(params, x, t_frames, ctx, fps,
                         no_temporal_attn=True)
        return temporal_guidance_scale * (e_t - e_i)

    def eps_fn(x, t_frames):
        if uncond_context is None or guidance_scale == 1.0:
            eps = unet_apply(params, x, t_frames,
                             expand_context(context, x.shape[0]), fps)
            tt = temporal_term(x, t_frames)
            return eps if tt is None else eps + tt
        b = x.shape[0]
        # INTERLEAVED cond/uncond (row 2i = cond_i, row 2i+1 = uncond_i):
        # under a sharded window batch each device holds both halves of its
        # windows, so the CFG combine below stays shard-local (no all-to-all,
        # unlike a [cond... | uncond...] concat).
        x2 = jnp.stack([x, x], axis=1).reshape((2 * b,) + x.shape[1:])
        t2 = jnp.stack([t_frames, t_frames], axis=1).reshape(
            (2 * b,) + t_frames.shape[1:])
        ctx_c = expand_context(context, b)
        ctx_u = expand_context(uncond_context, b)
        ctx2 = jnp.stack([ctx_c, ctx_u], axis=1).reshape(
            (2 * b,) + context.shape[1:])
        eps = unet_apply(params, x2, t2, ctx2, fps)
        pairs = eps.reshape((b, 2) + eps.shape[1:])
        e_c, e_u = pairs[:, 0], pairs[:, 1]
        out = combine(e_c, e_u)
        tt = temporal_term(x, t_frames)
        return out if tt is None else out + tt

    return eps_fn


def ddim_step_math(
    sch: DiffusionSchedule,
    x: jnp.ndarray,
    eps: jnp.ndarray,
    index,
    noise: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One DDIM update at schedule `index` (scalar or per-frame array).

    Implements p_sample_ddim's math (ddim.py:332-357) including use_scale.
    `index` may be a scalar (uniform) or shaped to broadcast over frames.
    """
    expand = lambda a: a.reshape(jnp.shape(index) + (1,) * (x.ndim - jnp.ndim(index) - 1))
    a_t = expand(sch.ddim_alphas[index])
    a_prev = expand(sch.ddim_alphas_prev[index])
    sigma = expand(sch.ddim_sigmas[index])
    sqrt_1ma = expand(sch.ddim_sqrt_one_minus_alphas[index])

    pred_x0 = (x - sqrt_1ma * eps) / jnp.sqrt(a_t)
    dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * eps

    if sch.use_scale:
        scale_t = expand(sch.ddim_scale_arr[index])
        scale_prev = expand(sch.ddim_scale_arr_prev[index])
        pred_x0 = pred_x0 / scale_t
        x_prev = jnp.sqrt(a_prev) * scale_prev * pred_x0 + dir_xt + sigma * noise
    else:
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + sigma * noise
    return x_prev, pred_x0


def ddim_sample(
    eps_fn: Callable,
    sch: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    x_T: Optional[jnp.ndarray] = None,
    temperature: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full DDIM sampling: scan over S steps from pure noise.

    shape: [B, T, H, W, C]. Returns (x0_latent, x_T) — the initial noise is
    returned for the FIFO latent cache (ddim.py:233-234 saves `0.pt`).

    Key layout: key → (init_noise, step_0, step_1, ..., step_{S-1}).
    """
    b, t = shape[0], shape[1]
    key_init, key_steps = jax.random.split(key)
    if x_T is None:
        x_T = shared_normal(key_init, shape)
    S = sch.num_ddim_steps
    step_keys = jax.random.split(key_steps, S)

    def body(x, per_step):
        i, k = per_step
        index = S - 1 - i
        step = sch.ddim_timesteps[index]
        t_frames = jnp.broadcast_to(step, (b, t)).astype(jnp.int32)
        eps = eps_fn(x, t_frames)
        noise = temperature * shared_normal(k, x.shape)
        x_prev, _ = ddim_step_math(sch, x, eps, index, noise)
        return x_prev, None

    x0, _ = jax.lax.scan(body, x_T, (jnp.arange(S), step_keys))
    return x0, x_T


def stochastic_encode(
    sch: DiffusionSchedule, x0: jnp.ndarray, index, noise: jnp.ndarray
) -> jnp.ndarray:
    """q(x_t|x_0) at DDIM step `index` (ddim.py:651-671)."""
    shape = jnp.shape(index) + (1,) * (x0.ndim - jnp.ndim(index) - 1)
    a = sch.ddim_alphas[index].reshape(shape)
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def ddim_decode(
    eps_fn: Callable,
    sch: DiffusionSchedule,
    x_latent: jnp.ndarray,   # [B, T, H, W, C] partially-noised latent
    t_start: int,            # number of DDIM steps to run (static)
    key: jax.Array,
) -> jnp.ndarray:
    """Partial DDIM sampling from schedule position `t_start` down to 0 —
    the reference's `DDIMSampler.decode` (ddim.py:673-692): the counterpart
    of `stochastic_encode` for edit-style resampling.

    Runs the same per-step math as `ddim_sample` (p_sample_ddim incl. the
    use_scale correction) but as a scan over only the first `t_start`
    schedule entries, reversed. Key layout: key → (step_0 … step_{t_start-1}).
    """
    b, t = x_latent.shape[0], x_latent.shape[1]
    step_keys = jax.random.split(key, t_start)

    def body(x, per_step):
        i, k = per_step
        index = t_start - 1 - i
        step = sch.ddim_timesteps[index]
        t_frames = jnp.broadcast_to(step, (b, t)).astype(jnp.int32)
        eps = eps_fn(x, t_frames)
        noise = shared_normal(k, x.shape)
        x_prev, _ = ddim_step_math(sch, x, eps, index, noise)
        return x_prev, None

    x0, _ = jax.lax.scan(body, x_latent, (jnp.arange(t_start), step_keys))
    return x0


def ddim_invert_frames(
    sch: DiffusionSchedule,
    clean_latents: jnp.ndarray,  # [B, T0, h, w, C] VAE-encoded frames
    key: jax.Array,
) -> jnp.ndarray:
    """'DDIM inversion' per the reference (ddim.py:972-1032): despite the
    name it is CLOSED-FORM, not model-in-loop — each schedule step i takes
    frame max(0, i-(S-T0)) and noises it to level α_i
    (√α_i·x0 + √(1-α_i)·ε, ddim.py:1016-1021), producing the [B, S, h, w, C]
    diagonal latent stack that seeds a FIFO queue (same index math as
    prepare_latents, funcs.py:63-77, without the lookahead prefix).

    Key layout: one normal draw per schedule slot (the reference draws a
    fresh randn per step, ddim.py:1019).
    """
    import numpy as np

    S = sch.num_ddim_steps
    T0 = clean_latents.shape[1]
    frame_idx = jnp.asarray(np.maximum(0, np.arange(S) - (S - T0)))
    frames = clean_latents[:, frame_idx]                    # [B, S, h, w, C]
    noise = jax.random.normal(key, frames.shape, jnp.float32)
    idx = jnp.arange(S)
    return stochastic_encode(sch, frames, idx, noise.astype(frames.dtype))
