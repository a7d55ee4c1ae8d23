"""FreeInit filters and frequency mixing."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from moca_tpu import freeinit


def _reference_gaussian(shape, d_s, d_t):
    """Direct triple-loop translation of freeinit_utils.py:73-91."""
    T, H, W = shape[-3], shape[-2], shape[-1]
    mask = np.zeros(shape)
    for t in range(T):
        for h in range(H):
            for w in range(W):
                d2 = ((d_s / d_t) * (2 * t / T - 1)) ** 2 + (2 * h / H - 1) ** 2 + (
                    2 * w / W - 1
                ) ** 2
                mask[..., t, h, w] = math.exp(-1 / (2 * d_s**2) * d2)
    return mask


def test_gaussian_filter_matches_loop_reference():
    shape = (1, 4, 3, 5, 6)
    got = freeinit.gaussian_low_pass_filter(shape, 0.25, 0.25)
    want = _reference_gaussian(shape, 0.25, 0.25)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_filters_zero_when_ds_zero():
    for fn in (
        freeinit.gaussian_low_pass_filter,
        freeinit.ideal_low_pass_filter,
        freeinit.box_low_pass_filter,
    ):
        assert (fn((2, 2, 4, 4), d_s=0.0) == 0).all()


def test_butterworth_range():
    f = freeinit.butterworth_low_pass_filter((1, 8, 8, 8), n=4, d_s=0.25, d_t=0.25)
    assert (f >= 0).all() and (f <= 1).all()


def test_box_filter_center_on():
    f = freeinit.box_low_pass_filter((1, 8, 16, 16), d_s=0.5, d_t=0.5)
    assert f[0, 4, 8, 8] == 1.0
    assert f[0, 0, 0, 0] == 0.0


def test_freq_mix_identity_when_lpf_one():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 2, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    lpf = jnp.ones(x.shape)
    out = freeinit.freq_mix_3d(x, noise, lpf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_freq_mix_noise_when_lpf_zero():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (1, 4, 2, 8, 8))
    noise = jax.random.normal(jax.random.PRNGKey(1), x.shape)
    lpf = jnp.zeros(x.shape)
    out = freeinit.freq_mix_3d(x, noise, lpf)
    np.testing.assert_allclose(np.asarray(out), np.asarray(noise), atol=1e-4)


def test_freq_mix_preserves_mean_component():
    # DC (mean) is the lowest frequency: with a gaussian LPF the DC of the
    # output should be dominated by x's DC, not the noise's.
    x = jnp.ones((1, 1, 4, 16, 16)) * 3.0
    noise = jnp.zeros_like(x)
    lpf = freeinit.get_freq_filter(x.shape, "gaussian", 1, 0.25, 0.25)
    out = freeinit.freq_mix_3d(x, noise, lpf)
    # gaussian LPF value at exact center bin for even dims: exp(-1/(2 d_s^2)·d²(center))
    # The mean of out should be x.mean() · lpf[center]
    cf, cr, cc = 4 // 2, 16 // 2, 16 // 2
    np.testing.assert_allclose(
        float(out.mean()), 3.0 * float(lpf[0, 0, cf, cr, cc]), rtol=1e-4
    )


def test_filter_cache_numpy_backing():
    # the numpy mask is cached; the jnp wrapper is fresh per call (a cached
    # jnp array created under a jit trace would leak a tracer)
    a = freeinit._cached_filter_np((1, 4, 1, 8, 8), "gaussian", 1, 0.25, 0.25)
    b = freeinit._cached_filter_np((1, 4, 1, 8, 8), "gaussian", 1, 0.25, 0.25)
    assert a is b
    j = freeinit.get_freq_filter((1, 4, 1, 8, 8), "gaussian", 1, 0.25, 0.25)
    np.testing.assert_allclose(np.asarray(j), a)
