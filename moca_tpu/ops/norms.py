"""Normalization layers with the reference's fp32-stat semantics.

The reference computes GroupNorm in float32 then casts back to the activation
dtype (lvdm/basics.py:76-87 `GroupNormSpecific`); on TPU we keep activations
in bfloat16 but the norm statistics must stay fp32 for parity and stability.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class GroupNorm32(nn.Module):
    """GroupNorm evaluated in float32 regardless of input dtype.

    Channels-last: normalizes over (spatial..., channel-group) like
    torch.nn.GroupNorm on NCHW — groups partition the channel axis.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import math

        orig_dtype = x.dtype
        # production channel counts are multiples of 32; tiny test configs
        # fall back to the largest divisor
        groups = (self.num_groups if x.shape[-1] % self.num_groups == 0
                  else math.gcd(x.shape[-1], self.num_groups))
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)
