"""Pallas flash-attention kernels vs XLA reference.

The kernel tests need a real TPU (pallas interpret mode hangs in this
environment — see SKILL.md gotchas); the CPU suite runs only the pure
helpers. On-chip validation: `python tests/test_flash_attention.py` under
the axon TPU runs the full comparison (also exercised by bench.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.ops.flash_attention import _pick_block


def test_pick_block():
    assert _pick_block(2560) == 512
    assert _pick_block(640) == 128
    assert _pick_block(160) == 32


def _check_flash(b, s, h, d):
    from moca_tpu.ops.attention import _xla_attention
    from moca_tpu.ops.flash_attention import flash_attention

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    out = flash_attention(q, k, v)
    ref = _xla_attention(q, k, v)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 0.02, err


CASES = [
    (2, 2560, 5, 64),   # flash path
    (2, 640, 10, 64),   # small-S batched-rows path
    (2, 160, 20, 64),
]


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("b,s,h,d", CASES)
def test_flash_matches_xla_tpu(b, s, h, d):
    _check_flash(b, s, h, d)


if __name__ == "__main__":
    for b, s_, h, d in CASES:
        _check_flash(b, s_, h, d)
        print(f"ok s={s_}")
