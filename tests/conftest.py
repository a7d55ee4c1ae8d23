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
