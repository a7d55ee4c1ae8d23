"""MoCA window step: momentum recurrence, injection gating, γ blend."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu import schedule
from moca_tpu.sampling.ddim import ddim_step_math
from moca_tpu.sampling.moca import MoCAConfig, moca_window_step


F = 4


@pytest.fixture(scope="module")
def sch():
    return schedule.make_schedule(ddim_num_steps=8, ddim_eta=1.0)


def _inputs(sch, key=0):
    k = jax.random.PRNGKey(key)
    x = jax.random.normal(k, (1, F, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(key + 1), x.shape) * 0.1
    indices = jnp.arange(F, dtype=jnp.int32)
    ts = jnp.asarray(sch.ddim_timesteps)[indices]
    return x, eps, indices, ts


def _reference_window_step(sch, cfg, x, eps, indices, ts, noises,
                           cond_image=None, masks=None):
    """Direct numpy translation of ddim.py:377-649 (momentum buffer as a
    persistent array, reversed nothing — single window), with the given
    per-frame noises substituted for torch.randn."""
    x = np.asarray(x); eps = np.asarray(eps)
    alphas = np.asarray(sch.ddim_alphas)
    alphas_prev = np.asarray(sch.ddim_alphas_prev)
    sigmas = np.asarray(sch.ddim_sigmas)
    sqrt1ma = np.asarray(sch.ddim_sqrt_one_minus_alphas)
    momentum = np.zeros_like(x)  # persistent buffer, slot 0 never written
    prev_frame = None
    x_prevs, pred_x0s = [], []
    for i, index in enumerate(np.asarray(indices)):
        xi = x[:, i]
        ei = eps[:, i]
        t = float(ts[i])
        a_t, a_prev, sigma, s1 = alphas[index], alphas_prev[index], sigmas[index], sqrt1ma[index]
        pred_x0 = (xi - s1 * ei) / np.sqrt(a_t)
        dir_xt = np.sqrt(max(1.0 - a_prev - sigma**2, 0.0)) * ei
        if prev_frame is not None:
            grad = (pred_x0 - prev_frame) + cfg.dir_weight * dir_xt
            momentum[:, i] = cfg.beta * momentum[:, i - 1] + (1 - cfg.beta) * grad
            strength = cfg.correction_gain * (1.0 - t / 1000.0)
            pred_x0 = pred_x0 + strength * momentum[:, i]
        prev_frame = pred_x0.copy()
        noise = sigma * np.asarray(noises[i])
        x_prev = np.sqrt(a_prev) * pred_x0 + dir_xt + noise
        if masks is not None and cond_image is not None:
            m = np.asarray(masks)[:, i]
            enh = cfg.davis_enhancement if t <= cfg.inject_threshold else 1.0
            if m.sum() != 0:
                pred_x0 = np.where(m > 0.5, np.asarray(cond_image) * enh, pred_x0)
        pred_x0 = (1 - cfg.gamma) * pred_x0 + cfg.gamma * noise
        x_prevs.append(x_prev)
        pred_x0s.append(pred_x0)
    return np.stack(x_prevs, 1), np.stack(pred_x0s, 1)


def test_matches_reference_math_no_injection(sch):
    """Scan-carried momentum ≡ the reference's persistent-buffer loop."""
    cfg = MoCAConfig()
    x, eps, indices, ts = _inputs(sch)
    key = jax.random.PRNGKey(42)
    x_prev, pred_x0 = moca_window_step(sch, cfg, x, eps, indices, ts, key)
    # extract the same noises the jax path used
    frame_keys = jax.random.split(key, F)
    noises = [np.asarray(jax.random.normal(k, x[:, 0].shape)) for k in frame_keys]
    ref_xp, ref_p0 = _reference_window_step(sch, cfg, x, eps, indices, ts, noises)
    np.testing.assert_allclose(np.asarray(x_prev), ref_xp, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_x0), ref_p0, rtol=2e-4, atol=2e-5)


def test_matches_reference_math_with_davis_masks(sch):
    cfg = MoCAConfig()
    x, eps, indices, ts = _inputs(sch, key=5)
    masks = (jax.random.uniform(jax.random.PRNGKey(9), (1, F, 4, 4, 1)) > 0.6
             ).astype(jnp.float32)
    cond = jnp.ones((4, 4, 2)) * 0.25
    key = jax.random.PRNGKey(43)
    x_prev, pred_x0 = moca_window_step(
        sch, cfg, x, eps, indices, ts, key, cond_image=cond, masks=masks)
    frame_keys = jax.random.split(key, F)
    noises = [np.asarray(jax.random.normal(k, x[:, 0].shape)) for k in frame_keys]
    ref_xp, ref_p0 = _reference_window_step(
        sch, cfg, x, eps, indices, ts, noises, cond_image=cond, masks=masks)
    np.testing.assert_allclose(np.asarray(x_prev), ref_xp, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(pred_x0), ref_p0, rtol=2e-4, atol=2e-5)


def test_injection_does_not_touch_queue_by_default(sch):
    """Reference-faithful mode: x_prev is computed before injection
    (ddim.py:562 precedes :565-609)."""
    cfg = MoCAConfig()
    x, eps, indices, ts = _inputs(sch)
    key = jax.random.PRNGKey(1)
    masks = jnp.ones((1, F, 4, 4, 1))
    cond = jnp.full((4, 4, 2), 9.0)
    xp_masked, _ = moca_window_step(
        sch, cfg, x, eps, indices, ts, key, cond_image=cond, masks=masks)
    xp_plain, _ = moca_window_step(sch, cfg, x, eps, indices, ts, key)
    np.testing.assert_allclose(np.asarray(xp_masked), np.asarray(xp_plain), atol=1e-6)


def test_inject_into_queue_mode_changes_queue(sch):
    cfg = MoCAConfig(inject_into_queue=True)
    x, eps, indices, ts = _inputs(sch)
    key = jax.random.PRNGKey(1)
    masks = jnp.ones((1, F, 4, 4, 1))
    cond = jnp.full((4, 4, 2), 9.0)
    xp_masked, _ = moca_window_step(
        sch, cfg, x, eps, indices, ts, key, cond_image=cond, masks=masks)
    xp_plain, _ = moca_window_step(sch, cfg, x, eps, indices, ts, key)
    assert not np.allclose(np.asarray(xp_masked), np.asarray(xp_plain))


def test_gamma_plumbed(sch):
    """γ actually takes effect (the reference silently swallows it,
    funcs.py:330/347 → ddim.py:262-269)."""
    cfg = MoCAConfig()
    x, eps, indices, ts = _inputs(sch)
    key = jax.random.PRNGKey(3)
    _, p0_a = moca_window_step(sch, cfg, x, eps, indices, ts, key,
                               gamma=jnp.float32(0.0))
    _, p0_b = moca_window_step(sch, cfg, x, eps, indices, ts, key,
                               gamma=jnp.float32(0.9))
    assert not np.allclose(np.asarray(p0_a), np.asarray(p0_b))


def test_ddim_step_math_use_scale(sch):
    """Base-sampler step divides pred_x0 by scale_t and multiplies
    scale_prev into the x_prev mean term (ddim.py:349-355)."""
    x = jnp.ones((1, 2, 4, 4, 2))
    eps = jnp.zeros_like(x) + 0.1
    noise = jnp.zeros_like(x)
    index = 3
    xp, p0 = ddim_step_math(sch, x, eps, jnp.asarray(index), noise)
    a_t = float(sch.ddim_alphas[index])
    a_prev = float(sch.ddim_alphas_prev[index])
    sig = float(sch.ddim_sigmas[index])
    s1 = float(sch.ddim_sqrt_one_minus_alphas[index])
    st = float(sch.ddim_scale_arr[index])
    sp = float(sch.ddim_scale_arr_prev[index])
    want_p0 = ((1.0 - s1 * 0.1) / np.sqrt(a_t)) / st
    want_xp = np.sqrt(a_prev) * sp * want_p0 + np.sqrt(max(1 - a_prev - sig**2, 0)) * 0.1
    np.testing.assert_allclose(np.asarray(p0)[0, 0, 0, 0, 0], want_p0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(xp)[0, 0, 0, 0, 0], want_xp, rtol=1e-5)
