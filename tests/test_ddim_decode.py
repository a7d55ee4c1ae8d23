"""Closed-form tests for `ddim_decode` (ref ddim.py:673-692) and
`ddim_invert_frames` (ref ddim.py:972-1032)."""

import numpy as np
import jax
import jax.numpy as jnp

from moca_tpu.sampling.ddim import (
    ddim_decode, ddim_invert_frames, ddim_sample, stochastic_encode,
)
from moca_tpu.sampling.fifo import make_fifo_plan, prepare_queue
from moca_tpu.schedule import make_schedule

SHAPE = (1, 2, 4, 4, 3)


def _zero_eps(x, t):
    return jnp.zeros_like(x)


def _toy_eps(x, t):
    # deterministic, t-dependent, model-free epsilon for loop-parity tests
    return 0.1 * x + 0.05 * jnp.sin(t.astype(jnp.float32))[..., None, None, None]


def test_decode_zero_eps_eta0_telescopes():
    """With ε≡0 and η=0 each step multiplies by √α_prev/√α_t, so a decode
    from index k-1 telescopes to x·√α_prev[0]/√α[k-1]."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=0.0, use_scale=False)
    x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
    k = 5
    out = ddim_decode(_zero_eps, sch, x, k, jax.random.PRNGKey(1))
    factor = jnp.sqrt(sch.ddim_alphas_prev[0]) / jnp.sqrt(sch.ddim_alphas[k - 1])
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * float(factor),
                               rtol=1e-5, atol=1e-6)


def test_decode_matches_reference_step_loop():
    """Python translation of the reference decode loop (p_sample_ddim math
    incl. the use_scale correction, ddim.py:332-357,673-692) — bit-parity."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=1.0, use_scale=True)
    x = jax.random.normal(jax.random.PRNGKey(2), SHAPE)
    t_start, key = 6, jax.random.PRNGKey(3)
    out = ddim_decode(_toy_eps, sch, x, t_start, key)

    xs = x
    step_keys = jax.random.split(key, t_start)
    b, t = SHAPE[0], SHAPE[1]
    for i in range(t_start):
        index = t_start - 1 - i
        step = sch.ddim_timesteps[index]
        tf = jnp.broadcast_to(step, (b, t)).astype(jnp.int32)
        e = _toy_eps(xs, tf)
        a_t = sch.ddim_alphas[index]
        a_prev = sch.ddim_alphas_prev[index]
        sigma = sch.ddim_sigmas[index]
        sqrt_1ma = sch.ddim_sqrt_one_minus_alphas[index]
        pred_x0 = (xs - sqrt_1ma * e) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * e
        noise = jax.random.normal(step_keys[i], xs.shape, jnp.float32)
        pred_x0 = pred_x0 / sch.ddim_scale_arr[index]
        xs = (jnp.sqrt(a_prev) * sch.ddim_scale_arr_prev[index] * pred_x0
              + dir_xt + sigma * noise)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs),
                               rtol=1e-5, atol=1e-6)


def test_full_decode_equals_ddim_sample():
    """decode(x_T, S) is exactly the tail of ddim_sample given the same
    per-step key stream."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=1.0, use_scale=True)
    key = jax.random.PRNGKey(4)
    x_T = jax.random.normal(jax.random.PRNGKey(5), SHAPE)
    x0_a, _ = ddim_sample(_toy_eps, sch, SHAPE, key, x_T=x_T)
    _, key_steps = jax.random.split(key)
    x0_b = ddim_decode(_toy_eps, sch, x_T, sch.num_ddim_steps, key_steps)
    np.testing.assert_allclose(np.asarray(x0_a), np.asarray(x0_b),
                               rtol=1e-6, atol=1e-7)


def test_decode_inverts_stochastic_encode_zero_eps():
    """stochastic_encode then zero-ε/η=0 decode recovers x0 up to the
    injected noise term's decay — with ε≡0 and zero noise the composition
    is exactly √α_prev[0]·x0 + decayed-ε path; use ε noise 0 for exactness."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=0.0, use_scale=False)
    x0 = jax.random.normal(jax.random.PRNGKey(6), SHAPE)
    k = 4
    enc = stochastic_encode(sch, x0, k - 1, jnp.zeros_like(x0))
    dec = ddim_decode(_zero_eps, sch, enc, k, jax.random.PRNGKey(7))
    # enc = √α[k-1]·x0, decode multiplies by √α_prev[0]/√α[k-1]
    np.testing.assert_allclose(
        np.asarray(dec),
        np.asarray(x0) * float(jnp.sqrt(sch.ddim_alphas_prev[0])),
        rtol=1e-5, atol=1e-6)


def test_inversion_frame_map_and_noise_levels():
    """Slot i holds frame max(0, i-(S-T0)) noised at α_i (ddim.py:1016-1021)."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=1.0, use_scale=False)
    key = jax.random.PRNGKey(8)
    clean = jax.random.normal(jax.random.PRNGKey(9), (2, 4, 4, 4, 3))
    out = ddim_invert_frames(sch, clean, key)
    assert out.shape == (2, 8, 4, 4, 3)

    S, T0 = 8, 4
    fidx = np.maximum(0, np.arange(S) - (S - T0))
    frames = np.asarray(clean)[:, fidx]
    noise = np.asarray(jax.random.normal(key, frames.shape, jnp.float32))
    a = np.asarray(sch.ddim_alphas)[np.arange(S)][None, :, None, None, None]
    expected = np.sqrt(a) * frames + np.sqrt(1 - a) * noise
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)


def test_inversion_equals_prepare_queue_without_lookahead():
    """The reference's ddim_inversion builds exactly the no-lookahead FIFO
    queue (same math as prepare_latents, funcs.py:63-77)."""
    sch = make_schedule(ddim_num_steps=8, ddim_eta=1.0, use_scale=False)
    plan = make_fifo_plan(np.asarray(sch.ddim_timesteps), 4, 2,
                          lookahead=False)
    clean = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 4, 4, 3))
    key = jax.random.PRNGKey(11)
    a = ddim_invert_frames(sch, clean, key)
    b = prepare_queue(sch, plan, clean, key)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
