"""GroupNorm32 act-fusion semantics (the Pallas GroupNorm kernels
themselves were measured SLOWER than XLA's fused path and removed —
see the negative-result note in ops/norms.py and README's optimization
log: fully-fused GN+SiLU 2.008→2.079 s/frame, stats-only 2.008→2.145)."""

import numpy as np
import jax
import jax.numpy as jnp


def test_groupnorm_act_fusion():
    """act='silu' equals norm-then-silu."""
    from moca_tpu.ops.norms import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 32), jnp.float32)
    plain = GroupNorm32(32)
    fused = GroupNorm32(32, act="silu")
    params = plain.init(jax.random.PRNGKey(1), x)
    y0 = jax.nn.silu(plain.apply(params, x))
    y1 = fused.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0), atol=1e-6)


def test_groupnorm_act_bf16():
    from moca_tpu.ops.norms import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64), jnp.bfloat16)
    gn = GroupNorm32(32, act="silu")
    params = gn.init(jax.random.PRNGKey(1), x)
    y = gn.apply(params, x)
    assert y.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(y.astype(jnp.float32)).all())


def test_groupnorm_stat_variants_match(monkeypatch):
    """MOCA_TPU_GN_STAT strategies (vpu / dot / stack) are numerically
    interchangeable — they re-route the SAME fp32 Σx/Σx² through different
    units/fusions (perf experiment, docs/PERF.md headroom item 1)."""
    from moca_tpu.ops.norms import GroupNorm32

    x = jax.random.normal(jax.random.PRNGKey(2), (3, 5, 7, 64), jnp.bfloat16)
    gn = GroupNorm32(32, act="silu")
    params = gn.init(jax.random.PRNGKey(3), x)

    outs = {}
    for mode in ("", "dot", "stack"):
        monkeypatch.setenv("MOCA_TPU_GN_STAT", mode)
        jax.clear_caches()  # env branch is trace-time
        outs[mode] = np.asarray(gn.apply(params, x), np.float32)
    monkeypatch.delenv("MOCA_TPU_GN_STAT")
    np.testing.assert_allclose(outs["dot"], outs[""], atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(outs["stack"], outs[""], atol=2e-6, rtol=1e-5)
