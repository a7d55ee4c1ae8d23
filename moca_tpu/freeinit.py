"""FreeInit frequency-domain noise reinitialization (TPU-native).

Re-implements utils/freeinit_utils.py with two structural changes:
  * filter masks are built with broadcast meshgrids instead of the
    reference's triple Python loops over (T,H,W) (freeinit_utils.py:73-134),
  * `freq_mix_3d` is pure jnp (fft in float32, like the reference forces).

The FIFO tail-shift calls this every output frame with a (B,C,1,H,W) anchor
and a gaussian filter d_s=d_t=0.25 (scripts/evaluation/funcs.py:95-97), so the
filter is cached by shape via `functools.lru_cache` on the numpy builder.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _normalized_dist_sq(shape, d_s: float, d_t: float) -> np.ndarray:
    """d² grid used by all filters (freeinit_utils.py:89,111,132)."""
    T, H, W = shape[-3], shape[-2], shape[-1]
    t = (d_s / d_t) * (2.0 * np.arange(T) / T - 1.0)
    h = 2.0 * np.arange(H) / H - 1.0
    w = 2.0 * np.arange(W) / W - 1.0
    d2 = (
        (t**2)[:, None, None]
        + (h**2)[None, :, None]
        + (w**2)[None, None, :]
    )
    return np.broadcast_to(d2, shape)


def gaussian_low_pass_filter(shape, d_s=0.25, d_t=0.25) -> np.ndarray:
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, np.float32)
    d2 = _normalized_dist_sq(shape, d_s, d_t)
    return np.exp(-1.0 / (2 * d_s**2) * d2).astype(np.float32)


def butterworth_low_pass_filter(shape, n=4, d_s=0.25, d_t=0.25) -> np.ndarray:
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, np.float32)
    d2 = _normalized_dist_sq(shape, d_s, d_t)
    return (1.0 / (1.0 + (d2 / d_s**2) ** n)).astype(np.float32)


def ideal_low_pass_filter(shape, d_s=0.25, d_t=0.25) -> np.ndarray:
    """Note: reference thresholds at `d_square <= d_s*2` — literally 2·d_s,
    not d_s² (freeinit_utils.py:133). Preserved as-is for parity."""
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, np.float32)
    d2 = _normalized_dist_sq(shape, d_s, d_t)
    return (d2 <= d_s * 2).astype(np.float32)


def box_low_pass_filter(shape, d_s=0.25, d_t=0.25) -> np.ndarray:
    """freeinit_utils.py:137-157."""
    if d_s == 0 or d_t == 0:
        return np.zeros(shape, np.float32)
    T, H, W = shape[-3], shape[-2], shape[-1]
    mask = np.zeros(shape, np.float32)
    ts = round(int(H // 2) * d_s)
    tt = round(T // 2 * d_t)
    cf, cr, cc = T // 2, H // 2, W // 2
    mask[..., cf - tt : cf + tt, cr - ts : cr + ts, cc - ts : cc + ts] = 1.0
    return mask


@functools.lru_cache(maxsize=8)
def _cached_filter_np(shape: tuple, filter_type: str, n: int, d_s: float,
                      d_t: float) -> np.ndarray:
    # NOTE: cache NUMPY only. A jnp array created while a jit trace is
    # active is a tracer; caching it across traces leaks it
    # (jax.errors.UnexpectedTracerError).
    if filter_type == "gaussian":
        return gaussian_low_pass_filter(shape, d_s, d_t)
    if filter_type == "ideal":
        return ideal_low_pass_filter(shape, d_s, d_t)
    if filter_type == "box":
        return box_low_pass_filter(shape, d_s, d_t)
    if filter_type == "butterworth":
        return butterworth_low_pass_filter(shape, n, d_s, d_t)
    raise NotImplementedError(filter_type)


def get_freq_filter(shape, filter_type: str, n: int, d_s: float, d_t: float):
    """Build (and cache) the low-pass filter (freeinit_utils.py:51-71)."""
    return jnp.asarray(_cached_filter_np(tuple(shape), filter_type, n, d_s, d_t))


def freq_mix_3d(x: jnp.ndarray, noise: jnp.ndarray, lpf: jnp.ndarray) -> jnp.ndarray:
    """Keep x's low frequencies, take noise's high frequencies.

    FFT over the last three axes (T,H,W) in float32, matching
    freeinit_utils.py:7-47 (which squeezes the batch axis; jnp broadcasting
    makes that unnecessary here — numerics are identical).
    """
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    n32 = noise.astype(jnp.float32)
    lpf = lpf.astype(jnp.float32)

    axes = (-3, -2, -1)
    x_freq = jnp.fft.fftshift(jnp.fft.fftn(x32, axes=axes), axes=axes)
    n_freq = jnp.fft.fftshift(jnp.fft.fftn(n32, axes=axes), axes=axes)
    mixed = x_freq * lpf + n_freq * (1.0 - lpf)
    out = jnp.fft.ifftn(jnp.fft.ifftshift(mixed, axes=axes), axes=axes).real
    return out.astype(dtype)
