"""Test harness: run everything on a virtual 8-device CPU mesh.

Env must be set before the first `import jax` anywhere in the test process,
so this module sets it at import time (pytest imports conftest first).
"""

import os

# FORCE cpu: the environment presets JAX_PLATFORMS=axon (remote TPU tunnel,
# ~25 ms per eager dispatch) — setdefault would silently keep it and the
# 8-virtual-device mesh would never materialize.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon jax plugin PREPENDS itself to jax_platforms at import, ignoring
# the env var — override the config directly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# this CPU jaxlib defaults matmuls to a low-precision path even for f32
# inputs (~1e-2 error vs numpy); parity tests need true f32
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


# A full-suite run accumulates every module's compiled executables (and all
# the torch-oracle modules' state) in one process; past ~200 tests an XLA
# CPU compile has been seen to segfault — twice, both times inside
# `backend_compile_and_load` while compiling a sharded-pipeline module near
# the end of the alphabetical order; every test passes in isolation. Two
# mitigations: (1) run the heaviest-compile modules FIRST, in a lean
# process, before the torch-heavy oracle modules; (2) drop the jit caches
# after every module so no compile ever happens in a process bloated by a
# hundred earlier executables (cross-module cache reuse is ~nil — fixtures
# are module-scoped — so this costs nothing).
_HEAVY_FIRST = (
    "test_pipeline_sharding.py",
    "test_pipeline_e2e.py",
    "test_sharding.py",
)


def pytest_collection_modifyitems(session, config, items):
    order = {name: i for i, name in enumerate(_HEAVY_FIRST)}

    def key(item):
        return order.get(item.path.name, len(_HEAVY_FIRST))

    items.sort(key=key)  # stable: within-module order preserved


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
