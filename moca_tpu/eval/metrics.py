"""Video quality metrics (JAX, device-runnable).

The reference defers metrics to an external git submodule
(`common_metrics_on_video_quality`, .gitmodules:1-3) and VBench JSON sweeps
(SURVEY §4). Here SSIM/PSNR are first-class (SSIM is also the parity
criterion vs the CUDA reference — BASELINE.md: per-frame SSIM ≥ 0.98), plus
a VGG-free temporal-consistency proxy (mean Δframe SSIM) standing in for
LPIPS-T until perceptual weights are supplied.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [..., H, W, C] images (standard Wang et al. windowed
    formulation; matches skimage defaults gaussian_weights=True)."""
    k = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # HWIO, 1→1

    def filt(x):
        # depthwise: apply per channel
        x_ = jnp.moveaxis(x, -1, 0)[..., None]  # [C, ..., H, W, 1]
        shape = x_.shape
        flat = x_.reshape((-1,) + shape[-3:])
        out = jax.lax.conv_general_dilated(
            flat, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(out.reshape(shape[:-3] + out.shape[-3:])[..., 0],
                            0, -1)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(-3, -2, -1))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def temporal_lpips_proxy(video: jnp.ndarray) -> jnp.ndarray:
    """Mean 1−SSIM between consecutive frames of [T, H, W, C] — a
    perceptual-weight-free stand-in for LPIPS-T (lower = smoother)."""
    return jnp.mean(1.0 - ssim(video[:-1], video[1:]))
