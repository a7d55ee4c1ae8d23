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


def test_softmax_mode_parsing(monkeypatch):
    from moca_tpu.ops.flash_attention import _softmax_mode

    monkeypatch.delenv("MOCA_TPU_FA_SOFTMAX", raising=False)
    monkeypatch.delenv("MOCA_TPU_FA_NOMAX", raising=False)
    assert _softmax_mode() == "guarded"  # product default
    monkeypatch.setenv("MOCA_TPU_FA_NOMAX", "1")  # legacy raw-nomax alias
    assert _softmax_mode() == "nomax"
    monkeypatch.setenv("MOCA_TPU_FA_SOFTMAX", " Safe ")
    assert _softmax_mode() == "safe"  # explicit mode wins over the alias
    monkeypatch.setenv("MOCA_TPU_FA_SOFTMAX", "guarded")
    assert _softmax_mode() == "guarded"


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
    # eager/plain-jit uses the 16 MiB-safe blocks; the product path traces
    # under tuned_jit (64 MiB scoped VMEM → full-KV blocks at S=2560, 8 MB
    # small-S logits cap) — cover that block choice too
    from moca_tpu.xla_opts import tuned_jit

    out_tuned = tuned_jit(flash_attention)(q, k, v)
    err = float(jnp.max(jnp.abs(out_tuned.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 0.02, err


CASES = [
    (2, 2560, 5, 64),   # flash path
    (2, 640, 10, 64),   # small-S batched-rows path
    (2, 160, 20, 64),
]

# packed temporal kernel: every channel width the U-Net feeds it
# (num_head_channels=64 → heads = C/64)
PACKED_CASES = [(512, 16, 5, 64), (256, 16, 8, 64),
                (256, 16, 10, 64), (128, 16, 20, 64)]


def test_use_fused_qkv_gate(monkeypatch):
    """The fused-QKV route is OPT-IN (measured loss, docs/PERF.md) and the
    env gate takes a width allowlist. Runs on CPU: the backend check is the
    last gate, so allowlist/shape rejections are observable here; positive
    routing is asserted by stubbing the backend."""
    from moca_tpu.ops import attention as A

    # default env → off everywhere
    monkeypatch.delenv("MOCA_TPU_FA_FUSED_QKV", raising=False)
    assert not A.use_fused_qkv(16, 320, 5, 64)

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("MOCA_TPU_FA_FUSED_QKV", "1")
    assert A.use_fused_qkv(16, 320, 5, 64)
    assert A.use_fused_qkv(16, 512, 8, 64)
    assert not A.use_fused_qkv(16, 320, 10, 32)   # d != 64
    assert not A.use_fused_qkv(16, 640, 5, 64)    # inner != C
    assert not A.use_fused_qkv(77, 320, 5, 64)    # not tiny-S
    assert not A.use_fused_qkv(16, 1536, 24, 64)  # > 1280

    monkeypatch.setenv("MOCA_TPU_FA_FUSED_QKV", "320,512")
    assert A.use_fused_qkv(16, 320, 5, 64)
    assert A.use_fused_qkv(16, 512, 8, 64)
    assert not A.use_fused_qkv(16, 640, 10, 64)   # not in allowlist

    monkeypatch.setenv("MOCA_TPU_FA_FUSED_QKV", "0")
    assert not A.use_fused_qkv(16, 320, 5, 64)

    # C=1280 weights need the 64 MiB scoped-VMEM compile options
    from moca_tpu import xla_opts

    monkeypatch.setenv("MOCA_TPU_FA_FUSED_QKV", "1")
    monkeypatch.setattr(xla_opts, "big_vmem_available", lambda: False)
    assert not A.use_fused_qkv(16, 1280, 20, 64)
    monkeypatch.setattr(xla_opts, "big_vmem_available", lambda: True)
    assert A.use_fused_qkv(16, 1280, 20, 64)


def _check_fused_qkv(n, s, heads, d, tuned=False):
    """fused projections+attention+out kernel vs the XLA chain."""
    from moca_tpu.ops.attention import _xla_attention
    from moca_tpu.ops.flash_attention import fused_qkv_attention

    c = heads * d
    keys = jax.random.split(jax.random.PRNGKey(2), 6)
    x = jax.random.normal(keys[0], (n, s, c), jnp.bfloat16)
    wq, wk, wv, wo = (jax.random.normal(k, (c, c), jnp.bfloat16) * 0.05
                      for k in keys[1:5])
    bo = jax.random.normal(keys[5], (c,), jnp.bfloat16) * 0.05

    def ref_chain(x, wq, wk, wv, wo, bo):
        q = (x @ wq).reshape(n, s, heads, d)
        k = (x @ wk).reshape(n, s, heads, d)
        v = (x @ wv).reshape(n, s, heads, d)
        out = _xla_attention(q, k, v).reshape(n, s, c)
        return out @ wo + bo

    if tuned:
        from moca_tpu.xla_opts import tuned_jit

        out = tuned_jit(fused_qkv_attention, static_argnums=(6,))(
            x, wq, wk, wv, wo, bo, heads)
    else:
        out = fused_qkv_attention(x, wq, wk, wv, wo, bo, heads)
    ref = ref_chain(x, wq, wk, wv, wo, bo)
    # relative: the C=1280 out-proj sums 1280 bf16 terms → outputs O(2),
    # abs-0.02 is tighter than a bf16 ulp there
    scale_ref = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32)))) / scale_ref
    assert err < 0.02, err


# fused qkv+attention+out kernel: the temporal self-attention widths
FUSED_CASES = [(512, 16, 5, 64), (512, 16, 8, 64), (256, 16, 10, 64)]
FUSED_TUNED_CASES = [(128, 16, 20, 64)]  # C=1280 weights need 64 MiB VMEM


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("n,s,h,d", FUSED_CASES)
def test_fused_qkv_matches_xla_tpu(n, s, h, d):
    _check_fused_qkv(n, s, h, d)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("n,s,h,d", FUSED_TUNED_CASES)
def test_fused_qkv_tuned_matches_xla_tpu(n, s, h, d):
    """C=1280: the one fused-QKV width gated on the 64 MiB scoped-VMEM
    compile options — must run under tuned_jit to compile at all."""
    _check_fused_qkv(n, s, h, d, tuned=True)


def _check_packed(n, s, heads, d, lane=None):
    import os

    from moca_tpu.ops.attention import _xla_attention
    from moca_tpu.ops.flash_attention import packed_attention

    if lane is not None:  # force a specific packed variant for the check
        os.environ["MOCA_TPU_FA_PACKED_LANE"] = "1" if lane else "0"
    c = heads * d
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (n, s, c), jnp.bfloat16)
    k = jax.random.normal(kk, (n, s, c), jnp.bfloat16)
    v = jax.random.normal(kv, (n, s, c), jnp.bfloat16)
    out = packed_attention(q, k, v, heads)
    if lane is not None:
        del os.environ["MOCA_TPU_FA_PACKED_LANE"]
    q4 = q.reshape(n, s, heads, d)
    k4 = k.reshape(n, s, heads, d)
    v4 = v.reshape(n, s, heads, d)
    ref = _xla_attention(q4, k4, v4).reshape(n, s, c)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    assert err < 0.02, err


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("b,s,h,d", CASES)
def test_flash_matches_xla_tpu(b, s, h, d):
    _check_flash(b, s, h, d)


def _check_guarded_fallback(b, s, h, d, kind):
    """Adversarial inputs where raw nomax overflows/underflows: the guarded
    mode must detect the non-finite fp32 output and re-run the exact
    max-shifted kernel — BIT-IDENTICAL to running the safe mode directly.

    (No XLA comparison here: at |logit| ~ 2·10⁴ the kernels' bf16 q-scaling
    legitimately diverges from XLA's fp32 logits — safe and guarded diverge
    by the same amount, which is exactly what the bit-equality pins.)"""
    import os

    from moca_tpu.ops.flash_attention import flash_attention

    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (b, s, h, d), jnp.bfloat16)
    if kind == "overflow":
        # sharp head: max base-2 logit ≈ 40·40·d·scale·log2e ≫ 127
        q = q.at[0].set(jnp.abs(q[0]) + 40.0)
        k = k.at[0].set(jnp.abs(k[0]) + 40.0)
    elif kind == "denom_overflow":
        # every exp finite but the row SUM overflows (logit ≈ 121.9 base-2
        # on the flash path / 84.5 natural on the small path; both < the
        # per-element overflow threshold, both × S ≫ fp32 max) while |v| is
        # small enough that the accumulator stays finite: raw nomax then
        # returns a FINITE all-zero output (acc/inf) — the hazard an
        # output-only finiteness flag cannot see
        q = jnp.full_like(q, 3.25)
        k = jnp.full_like(k, 3.25)
        v = v * jnp.bfloat16(1e-5)
    else:  # all-rows underflow: exp2(-300·…) flushes to 0 → l = 0 → 0/0
        q = jnp.full_like(q, -40.0)
        k = jnp.full_like(k, 40.0)

    os.environ["MOCA_TPU_FA_SOFTMAX"] = "nomax"
    try:
        raw = flash_attention(q, k, v).astype(jnp.float32)
        os.environ["MOCA_TPU_FA_SOFTMAX"] = "safe"
        ref = flash_attention(q, k, v)
        os.environ["MOCA_TPU_FA_SOFTMAX"] = "guarded"
        out = flash_attention(q, k, v)
    finally:
        del os.environ["MOCA_TPU_FA_SOFTMAX"]
    if kind == "denom_overflow":
        # raw nomax is silently wrong here: finite (all zeros), not nan
        assert bool(jnp.all(jnp.isfinite(raw))), (
            "denom-overflow input unexpectedly NaNs raw nomax — test is stale")
        assert bool(jnp.all(raw == 0.0)) and not bool(
            jnp.all(ref.astype(jnp.float32) == 0.0)), (
            "denom-overflow input no longer zeroes raw nomax — test is stale")
    else:
        assert not bool(jnp.all(jnp.isfinite(raw))), (
            "adversarial input no longer trips raw nomax — test is stale")
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
    assert bool(jnp.all(out == ref)), "fallback is not bit-identical to safe"


GUARD_CASES = [
    (2, 2560, 5, 64, "overflow"),   # flash path, full-KV under tuned jit
    (2, 2560, 5, 64, "underflow"),
    (2, 2560, 5, 64, "denom_overflow"),
    (2, 640, 10, 64, "overflow"),   # small-S batched-rows path
    (2, 160, 20, 64, "underflow"),
    (2, 640, 10, 64, "denom_overflow"),
]


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("b,s,h,d,kind", GUARD_CASES)
def test_guarded_softmax_fallback_tpu(b, s, h, d, kind):
    _check_guarded_fallback(b, s, h, d, kind)


@pytest.mark.skipif(jax.default_backend() != "tpu", reason="needs TPU")
@pytest.mark.parametrize("lane", [False, True])
@pytest.mark.parametrize("n,s,h,d", PACKED_CASES)
def test_packed_matches_xla_tpu(n, s, h, d, lane):
    _check_packed(n, s, h, d, lane=lane)


if __name__ == "__main__":
    import os

    variant = [f"{k}={os.environ[k]}" for k in
               ("MOCA_TPU_FA_NOMAX", "MOCA_TPU_FA_PACKEDQM",
                "MOCA_TPU_FA_DIMSEM", "MOCA_TPU_FA_BQ", "MOCA_TPU_FA_BKV")
               if k in os.environ]
    print("variant:", variant or "default")
    for b, s_, h, d in CASES:
        _check_flash(b, s_, h, d)
        print(f"ok flash s={s_}")
    for b, s_, h, d, kind in GUARD_CASES:
        _check_guarded_fallback(b, s_, h, d, kind)
        print(f"ok guarded fallback s={s_} {kind}")
    for n, s_, h, d in PACKED_CASES:
        for lane in (False, True):
            _check_packed(n, s_, h, d, lane=lane)
            print(f"ok packed C={h * d} lane={lane}")
    for n, s_, h, d in FUSED_CASES:
        _check_fused_qkv(n, s_, h, d)
        print(f"ok fused qkv C={h * d}")
    for n, s_, h, d in FUSED_TUNED_CASES:
        _check_fused_qkv(n, s_, h, d, tuned=True)
        print(f"ok fused qkv C={h * d} (tuned)")
