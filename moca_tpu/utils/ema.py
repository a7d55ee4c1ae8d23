"""Exponential moving average of a parameter pytree.

Functional equivalent of the reference's `LitEma` (ref: lvdm/ema.py:5-76):
decay = min(decay, (1+updates)/(10+updates)), stored as a pytree + counter
instead of mutated module buffers. Inference never exercises this (use_ema
is false in the shipped config, yaml via ddpm3d.py:84-87), but it is part of
the model-stack inventory (SURVEY §2.1) and supports future fine-tuning.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class EMAState:
    params: Any
    num_updates: jnp.ndarray  # int32 scalar

    @classmethod
    def create(cls, params) -> "EMAState":
        return cls(params=jax.tree.map(jnp.asarray, params),
                   num_updates=jnp.asarray(0, jnp.int32))


def ema_update(state: EMAState, new_params, decay: float = 0.9999,
               use_num_updates: bool = True) -> EMAState:
    """One EMA step (lvdm/ema.py:24-40): shadow ← shadow − (1−d)(shadow − new)."""
    n = state.num_updates + 1
    if use_num_updates:
        d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    else:
        d = jnp.asarray(decay)
    one_minus = 1.0 - d
    shadow = jax.tree.map(
        lambda s, p: s - one_minus * (s - p.astype(s.dtype)),
        state.params, new_params)
    return EMAState(params=shadow, num_updates=n)
