"""Test harness: run everything on a virtual 8-device CPU mesh.

Env must be set before the first `import jax` anywhere in the test process,
so this module sets it at import time (pytest imports conftest first).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)
