"""Tuned XLA compiler options for the TPU product path.

The r3 flag sweep on v5e (docs/PERF.md) found two compile-time options that
speed up the flagship FIFO iteration with zero code change:

  * `xla_tpu_scoped_vmem_limit_kib=65536` — bigger fusion VMEM budget
    (1.992 → 1.961 s/frame; 98304 measured identical, default ≈ 16 MB),
  * `xla_tpu_use_bundle_aware_cost_model_for_fusions=true` — better fusion
    decisions around the N-minor-layout GN/relayout chains
    (1.961 → 1.924 s/frame; `xla_tpu_enable_experimental_fusion_cost_model`
    measured the same, the two are not additive),
  * `xla_tpu_dot_dot_fusion_duplicated=true` — allow fusing a dot into
    more than one consumer dot even when that duplicates it (the QKV/out
    projection chains around attention): ~10 ms/frame, confirmed by
    interleaved A/B (1.921/1.923 vs 1.915/1.911/1.912 s/frame).

Negative results (recorded so nobody re-tries them blind):
`xla_tpu_scavenge_vmem_for_fusions` + `xla_tpu_enable_vmem_to_vmem_dmas`
catastrophically regress to 17.4 s/frame; vector load/store fusion windows
(2048/512) cost ~10 ms/frame; `xla_tpu_dot_dot_fusion=false` 1.941;
`xla_tpu_enable_dot_strength_reduction=false` MISCOMPILES (the executable
returns in 2 ms — 196 TFLOP in 2 ms is physically impossible — never use);
a dozen further fusion/copy/prefetch knobs measured neutral, see
docs/PERF.md.

XLA_FLAGS cannot carry these under axon (the LOCAL CPU XLA parses the env
var and aborts on TPU-only flag names; compilation happens on the remote
service) — so they ride per-jit `compiler_options`, applied lazily at first
call and only when the backend is really a TPU (the CPU compiler rejects
the option names; tests run on CPU).

`MOCA_TPU_XLA_OPTS` overrides: "k=v;k=v" replaces the set, "" disables.
"""

from __future__ import annotations

import contextvars
import functools
import os
from typing import Optional

import jax

TUNED_TPU_OPTIONS = {
    "xla_tpu_scoped_vmem_limit_kib": "65536",
    "xla_tpu_use_bundle_aware_cost_model_for_fusions": "true",
    "xla_tpu_dot_dot_fusion_duplicated": "true",
}

# True while tracing under a tuned_jit whose compile options raise the
# scoped-VMEM limit to >= 64 MiB. Kernels consult this at trace time to pick
# block shapes beyond the stock 16 MiB budget (full-KV flash blocks, the 8 MB
# small-S logits cap). Declaring per-kernel `vmem_limit_bytes` instead is NOT
# equivalent: a blanket 64 MiB declaration on every attention pallas_call
# measured 17.28 s/frame vs 1.82 (driver bench, r3) — the reservations starve
# XLA's memory-space assignment around the kernels, the same signature as the
# catastrophic scavenge-vmem option.
_BIG_VMEM = contextvars.ContextVar("moca_tpu_big_vmem", default=False)


def big_vmem_available() -> bool:
    return _BIG_VMEM.get()


def _opts_raise_scoped_vmem(opts: Optional[dict]) -> bool:
    """Do these compile options raise the scoped-VMEM limit to >= 64 MiB?"""
    return bool(
        opts
        and int(opts.get("xla_tpu_scoped_vmem_limit_kib", "16384")) >= 65536)


def default_compiler_options() -> Optional[dict]:
    env = os.environ.get("MOCA_TPU_XLA_OPTS")
    if env is not None:
        opts = dict(p.split("=", 1) for p in env.split(";") if p)
        return opts or None
    try:
        backend = jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return None
    return dict(TUNED_TPU_OPTIONS) if backend == "tpu" else None


def tuned_jit(fn=None, **jit_kwargs):
    """`jax.jit` + the tuned TPU compiler options, resolved lazily.

    Decorators run at class-definition time, long before the backend is
    known (and the axon plugin rewrites the platform list at import) — so
    the real `jax.jit` object is created on first call. Works as a method
    decorator the same way jit does (functions are descriptors; self binds
    as arg 0 for static_argnums=(0,))."""
    if fn is None:
        return lambda f: tuned_jit(f, **jit_kwargs)

    cell = {}

    def _jitted():
        if "jit" not in cell:
            opts = default_compiler_options()
            cell["big_vmem"] = _opts_raise_scoped_vmem(opts)
            cell["jit"] = jax.jit(
                fn, compiler_options=opts, **jit_kwargs)
        return cell["jit"]

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        jitted = _jitted()
        token = _BIG_VMEM.set(cell["big_vmem"])
        try:
            return jitted(*args, **kwargs)
        finally:
            _BIG_VMEM.reset(token)

    def _lower(*a, **k):
        jitted = _jitted()
        token = _BIG_VMEM.set(cell["big_vmem"])
        try:
            return jitted.lower(*a, **k)
        finally:
            _BIG_VMEM.reset(token)

    wrapper.lower = _lower
    wrapper.clear_cache = lambda: cell.clear()
    return wrapper
