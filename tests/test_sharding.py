"""Multi-chip sharding: mesh construction + the full FIFO step on an
8-virtual-device CPU mesh (what the driver's dryrun_multichip validates)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.parallel.mesh import make_mesh, make_sharded_unet_apply


def test_make_mesh_default():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("dp", "fifo")


def test_make_mesh_2d():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((2, 4))
    assert mesh.shape == {"dp": 2, "fifo": 4}


def test_sharded_unet_apply_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh((2, 4))

    def unet_apply(params, x, t, ctx, fps=16):
        return x * params["w"] + t[..., None, None, None].astype(x.dtype)

    sharded = make_sharded_unet_apply(unet_apply, mesh)
    params = {"w": jnp.float32(0.5)}
    x = jax.random.normal(jax.random.PRNGKey(0), (16, 4, 8, 8, 4))
    t = jnp.tile(jnp.arange(4)[None], (16, 1))
    ctx = jnp.zeros((16, 7, 16))
    with jax.set_mesh(mesh):
        got = jax.jit(sharded)(params, x, t, ctx)
    want = unet_apply(params, x, t, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_irregular():
    """n_devices that doesn't divide the window count still works."""
    if len(jax.devices()) < 3:
        pytest.skip("needs 3 devices")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(3)
