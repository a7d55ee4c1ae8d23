"""Normalization layers with the reference's fp32-stat semantics.

The reference computes GroupNorm in float32 then casts back to the activation
dtype (lvdm/basics.py:76-87 `GroupNormSpecific`); on TPU we keep activations
in bfloat16 but the norm statistics must stay fp32 for parity and stability.

Implementation note (profiled on v5e): a naive channels-last GroupNorm
reduces over (spatial, C/groups-channel) slabs — strided 10-channel lane
subsets on the 128-lane VPU, measured at ~14× over the bandwidth roofline
(20.9 ms for one [256,40,64,320] norm; `convert_reduce_fusion` was 19% of
the whole FIFO step). This version reduces in two lane-friendly stages:
  1. per-CHANNEL Σx, Σx² over the spatial axes (channels ride the lanes),
  2. a tiny [N, groups, C/groups] combine, broadcast back per channel,
then a single fused elementwise normalize pass.
"""

from __future__ import annotations

import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp


def _stat_sums(flat: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-channel (Σx, Σx²) over the spatial axis of [N, M, C] fp32.

    MOCA_TPU_GN_STAT selects the reduction strategy (perf experiments on
    the ~0.42 s/frame GN/LN stat+relayout block, docs/PERF.md headroom
    item 1 — measured receipts there):

      * "" / "vpu" (default) — plain jnp.sum pair; XLA fuses both reduces
        (and the bf16→fp32 cast) into one pass over the activation.
      * "dot"  — ride the MXU instead: Σx and Σx² as ones-matvecs over M.
        Changes which unit does the reduction and what layout the fusion
        wants on x.
      * "stack" — a single stacked reduce (one jnp.sum over a [N,2,M,C]
        view) — forces ONE reduction op at the HLO level.
    """
    mode = os.environ.get("MOCA_TPU_GN_STAT", "").lower()
    if mode == "dot":
        ones = jnp.ones((flat.shape[1],), jnp.float32)
        s1 = jax.lax.dot_general(ones, flat, (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        s2 = jax.lax.dot_general(ones, flat * flat,
                                 (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return s1, s2
    if mode == "stack":
        stacked = jnp.stack([flat, flat * flat], axis=1)  # [N, 2, M, C]
        s = jnp.sum(stacked, axis=2)  # [N, 2, C]
        return s[:, 0], s[:, 1]
    return jnp.sum(flat, axis=1), jnp.sum(flat * flat, axis=1)


class _ScaleBias(nn.Module):
    """Affine params named like nn.GroupNorm so converted checkpoints map
    onto the same tree path (params['...']['GroupNorm_0']['scale'/'bias'])."""

    features: int
    param_dtype: jnp.dtype

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.features,),
                           self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          self.param_dtype)
        return scale.astype(jnp.float32), bias.astype(jnp.float32)


class GroupNorm32(nn.Module):
    """GroupNorm with fp32 statistics, channels-last [..., C].

    Same semantics as torch.nn.GroupNorm (groups partition the channel
    axis); see module docstring for the two-stage reduction rationale.

    act="silu" applies the activation inside the norm's elementwise pass
    (XLA fuses it into the consuming conv's input either way — see the
    measured Pallas negative-result note below).
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    param_dtype: jnp.dtype = jnp.float32
    act: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        # production channel counts are multiples of 32; tiny test configs
        # fall back to the largest divisor
        groups = (self.num_groups if c % self.num_groups == 0
                  else math.gcd(c, self.num_groups))
        gsize = c // groups

        n = x.shape[0]
        spatial = x.shape[1:-1]
        m = int(math.prod(spatial)) if spatial else 1

        # NOTE (measured, do not revisit naively): two Pallas GroupNorm
        # variants LOST to this XLA path on v5e (r2 FIFO bench) —
        # fully-fused GN+SiLU 2.008→2.079 s/frame, stats-only kernel
        # 2.008→2.145. XLA already (a) fuses the normalize+SiLU into the
        # consuming convolution's input and (b) keeps activations in
        # non-default (N-minor) layouts; a custom call forces canonical
        # layout on its operands, inserting hidden 400 MB transposes that
        # outweigh the 13-21 ms/instance saved on the stats pass.
        x32 = x.astype(jnp.float32)
        flat = x32.reshape(n, m, c)

        # stage 1: per-channel sums over spatial (lanes = channels);
        # strategy env-selectable for perf experiments (see _stat_sums)
        s1, s2 = _stat_sums(flat)             # [N, C] each
        # stage 2: tiny per-group combine
        g1 = s1.reshape(n, groups, gsize).sum(-1)   # [N, G]
        g2 = s2.reshape(n, groups, gsize).sum(-1)
        cnt = m * gsize
        mean_g = g1 / cnt
        var_g = g2 / cnt - mean_g * mean_g
        inv_g = 1.0 / jnp.sqrt(var_g + self.epsilon)
        mean_c = jnp.repeat(mean_g, gsize, axis=1)  # [N, C]
        inv_c = jnp.repeat(inv_g, gsize, axis=1)

        scale, bias = _ScaleBias(c, self.param_dtype, name="GroupNorm_0")()
        shape = (n,) + (1,) * len(spatial) + (c,)
        a = (inv_c * scale[None]).reshape(shape)
        b = (bias[None] - mean_c * inv_c * scale[None]).reshape(shape)
        y = x32 * a + b
        if self.act == "silu":
            y = y * jax.nn.sigmoid(y)
        return y.astype(orig_dtype)
