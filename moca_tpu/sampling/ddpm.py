"""DDPM ancestral sampler (the reference's non-DDIM path).

Re-implements the q/p sampling math of `DDPM`
(ref: lvdm/models/ddpm3d.py:200-274: q_sample, q_posterior,
predict_start_from_noise, p_mean_variance, p_sample, p_sample_loop) as a
jitted lax.scan. Used when ddim_steps ≤ 0 (inference.py:28 "otherwise use
DDPM"). Supports both parameterizations ('eps' | 'x0', ddpm3d.py:70).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from moca_tpu.sampling.ddim import shared_normal
from moca_tpu.schedule import DiffusionSchedule


def q_sample(sch: DiffusionSchedule, x0: jnp.ndarray, t, noise: jnp.ndarray,
             use_scale: Optional[bool] = None) -> jnp.ndarray:
    """Forward diffusion q(x_t|x_0) (ddpm3d.py:412-420, incl. the
    VideoCrafter2 use_scale ramp on the signal term)."""
    shape = jnp.shape(t) + (1,) * (x0.ndim - jnp.ndim(t) - 1)
    sa = sch.sqrt_alphas_cumprod[t].reshape(shape)
    sm = sch.sqrt_one_minus_alphas_cumprod[t].reshape(shape)
    scale = sch.scale_arr[t].reshape(shape) if (
        use_scale if use_scale is not None else sch.use_scale) else 1.0
    return sa * scale * x0 + sm * noise


def predict_start_from_noise(sch: DiffusionSchedule, x_t, t, noise):
    """(ddpm3d.py:212-216)."""
    shape = jnp.shape(t) + (1,) * (x_t.ndim - jnp.ndim(t) - 1)
    ac = sch.alphas_cumprod[t].reshape(shape)
    return jnp.sqrt(1.0 / ac) * x_t - jnp.sqrt(1.0 / ac - 1.0) * noise


def q_posterior(sch: DiffusionSchedule, x0, x_t, t,
                v_posterior: float = 0.0):
    """Posterior q(x_{t-1}|x_t,x_0) mean/variance (ddpm3d.py:143-153,
    register_schedule's posterior buffers computed on the fly)."""
    shape = jnp.shape(t) + (1,) * (x_t.ndim - jnp.ndim(t) - 1)
    betas = sch.betas[t].reshape(shape)
    ac = sch.alphas_cumprod[t].reshape(shape)
    ac_prev = sch.alphas_cumprod_prev[t].reshape(shape)
    alphas = 1.0 - betas

    coef1 = betas * jnp.sqrt(ac_prev) / (1.0 - ac)
    coef2 = (1.0 - ac_prev) * jnp.sqrt(alphas) / (1.0 - ac)
    mean = coef1 * x0 + coef2 * x_t
    var = (1.0 - v_posterior) * betas * (1.0 - ac_prev) / (1.0 - ac) \
        + v_posterior * betas
    log_var = jnp.log(jnp.maximum(var, 1e-20))
    return mean, var, log_var


def ddpm_sample(
    eps_fn: Callable,
    sch: DiffusionSchedule,
    shape: Tuple[int, ...],
    key: jax.Array,
    parameterization: str = "eps",
    clip_denoised: bool = False,
    x_T: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full ancestral sampling loop (p_sample_loop, ddpm3d.py:~250-274).

    eps_fn(x, t_frames) predicts ε (or x0 when parameterization='x0').
    """
    b, t_frames_n = shape[0], shape[1]
    key_init, key_steps = jax.random.split(key)
    # noise shared across the prompt batch (ddim.shared_normal: B>1
    # batched prompts reproduce B same-seed single runs)
    x = x_T if x_T is not None else shared_normal(key_init, shape)
    T = sch.num_timesteps
    keys = jax.random.split(key_steps, T)

    def body(x, per_step):
        i, k = per_step
        t = T - 1 - i
        tb = jnp.broadcast_to(t, (b, t_frames_n)).astype(jnp.int32)
        model_out = eps_fn(x, tb)
        if parameterization == "eps":
            x0 = predict_start_from_noise(sch, x, t, model_out)
        else:  # 'x0'
            x0 = model_out
        if clip_denoised:
            x0 = jnp.clip(x0, -1.0, 1.0)
        mean, _, log_var = q_posterior(sch, x0, x, t)
        # no noise at t == 0 (p_sample's nonzero_mask)
        noise = shared_normal(k, x.shape)
        nonzero = (t > 0).astype(jnp.float32)
        x_prev = mean + nonzero * jnp.exp(0.5 * log_var) * noise
        return x_prev, None

    x0, _ = jax.lax.scan(body, x, (jnp.arange(T), keys))
    return x0
