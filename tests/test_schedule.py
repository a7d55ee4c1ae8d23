"""Schedule numerics vs closed-form / reference-derived values."""

import numpy as np
import jax.numpy as jnp

from moca_tpu import schedule


def test_linear_betas_endpoints():
    b = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    assert b.shape == (1000,)
    np.testing.assert_allclose(b[0], 0.00085, rtol=1e-12)
    np.testing.assert_allclose(b[-1], 0.012, rtol=1e-12)
    # sqrt-space linearity: sqrt(betas) is an arithmetic progression
    s = np.sqrt(b)
    np.testing.assert_allclose(np.diff(s), np.diff(s)[0], rtol=1e-9)


def test_cosine_betas_bounded():
    b = schedule.make_beta_schedule("cosine", 100)
    assert (b >= 0).all() and (b <= 0.999).all()


def test_ddim_timesteps_uniform():
    ts = schedule.make_ddim_timesteps("uniform", 16, 1000)
    # reference formula: np.linspace(0, 999, 16).round()
    expected = np.linspace(0, 999, 16).round().astype(np.int64)
    np.testing.assert_array_equal(ts, expected)
    assert ts[0] == 0 and ts[-1] == 999


def test_ddim_timesteps_64():
    ts = schedule.make_ddim_timesteps("uniform", 64, 1000)
    assert ts.shape == (64,)
    assert (np.diff(ts) > 0).all()


def test_ddim_sampling_parameters_eta0_and_1():
    b = schedule.make_beta_schedule("linear", 1000, 0.00085, 0.012)
    ac = np.cumprod(1 - b)
    ts = schedule.make_ddim_timesteps("uniform", 16, 1000)
    sig0, a, ap = schedule.make_ddim_sampling_parameters(ac, ts, eta=0.0)
    assert (sig0 == 0).all()
    np.testing.assert_allclose(a, ac[ts])
    assert ap[0] == ac[0]
    np.testing.assert_allclose(ap[1:], ac[ts[:-1]])
    sig1, _, _ = schedule.make_ddim_sampling_parameters(ac, ts, eta=1.0)
    expected = np.sqrt((1 - ap) / (1 - a) * (1 - a / ap))
    np.testing.assert_allclose(sig1, expected, rtol=1e-12)


def test_scale_arr_ramp():
    arr = schedule.make_scale_arr(1000, 1.0, 0.7, 400)
    assert arr.shape == (1000,)
    np.testing.assert_allclose(arr[0], 1.0)
    np.testing.assert_allclose(arr[399], 0.7)
    assert (arr[400:] == 0.7).all()
    # ramp is linear over the first 400 steps
    np.testing.assert_allclose(np.diff(arr[:400]), np.diff(arr[:400])[0], atol=1e-12)


def test_timestep_embedding_values():
    # t=0: cos(0)=1 for the first half, sin(0)=0 for the second half
    emb = schedule.timestep_embedding(jnp.array([0.0]), 8)
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)
    # matches the reference formula for arbitrary t
    t, dim, mp = 123.0, 8, 10000
    half = dim // 2
    freqs = np.exp(-np.log(mp) * np.arange(half, dtype=np.float32) / np.float32(half))
    args = (np.float32(t) * freqs).astype(np.float32)
    expected = np.concatenate([np.cos(args), np.sin(args)])
    emb = schedule.timestep_embedding(jnp.array([t]), dim)
    np.testing.assert_allclose(np.asarray(emb[0]), expected, atol=1e-4)


def test_timestep_embedding_2d_input():
    # per-frame timesteps [B, T] produce [B, T, dim] — first-class FIFO path
    t = jnp.arange(6, dtype=jnp.float32).reshape(2, 3)
    emb = schedule.timestep_embedding(t, 320)
    assert emb.shape == (2, 3, 320)


def test_make_schedule_bundle():
    sch = schedule.make_schedule(ddim_num_steps=64, ddim_eta=1.0)
    assert sch.num_ddim_steps == 64
    assert sch.num_timesteps == 1000
    assert sch.ddim_alphas.shape == (64,)
    assert sch.ddim_scale_arr.shape == (64,)
    # scale arrays gathered at ddim timesteps
    np.testing.assert_allclose(
        np.asarray(sch.ddim_scale_arr),
        np.asarray(sch.scale_arr)[np.asarray(sch.ddim_timesteps)],
    )
    # prev scale: [scale_arr[0]] + gathered[:-1]
    assert sch.ddim_scale_arr_prev[0] == sch.scale_arr[0]


def test_make_schedule_no_scale():
    sch = schedule.make_schedule(ddim_num_steps=16, use_scale=False)
    assert (np.asarray(sch.scale_arr) == 1.0).all()
