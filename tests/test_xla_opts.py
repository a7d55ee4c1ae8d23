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
