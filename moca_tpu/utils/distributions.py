"""Diagonal Gaussian posterior math (ref: lvdm/distributions.py:24-95).

The VAE encode path returns (mean, logvar); these pure functions provide the
sample/kl/nll/mode operations of the reference's DiagonalGaussianDistribution.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def sample(mean: jnp.ndarray, logvar: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    std = jnp.exp(0.5 * jnp.clip(logvar, -30.0, 20.0))
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)


def mode(mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    return mean


def kl(mean: jnp.ndarray, logvar: jnp.ndarray,
       other: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None) -> jnp.ndarray:
    """KL to standard normal (or to another diagonal Gaussian), summed over
    non-batch dims (distributions.py:37-52)."""
    logvar = jnp.clip(logvar, -30.0, 20.0)
    var = jnp.exp(logvar)
    axes = tuple(range(1, mean.ndim))
    if other is None:
        return 0.5 * jnp.sum(mean**2 + var - 1.0 - logvar, axis=axes)
    o_mean, o_logvar = other
    o_var = jnp.exp(jnp.clip(o_logvar, -30.0, 20.0))
    return 0.5 * jnp.sum(
        (mean - o_mean) ** 2 / o_var + var / o_var - 1.0 - logvar + o_logvar,
        axis=axes)


def nll(mean: jnp.ndarray, logvar: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Negative log likelihood of x (distributions.py:54-60)."""
    logvar = jnp.clip(logvar, -30.0, 20.0)
    logtwopi = math.log(2.0 * math.pi)
    axes = tuple(range(1, mean.ndim))
    return 0.5 * jnp.sum(
        logtwopi + logvar + (x - mean) ** 2 / jnp.exp(logvar), axis=axes)
