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


def test_sharded_fifo_step_matches_unsharded():
    """The mesh-sharded FIFO step must be numerically identical to the
    single-device step (sharding is layout, not math)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import numpy as np
    from moca_tpu.models.unet3d import UNetConfig, UNet3D
    from moca_tpu.sampling.ddim import make_cfg_eps_fn
    from moca_tpu.sampling.fifo import fifo_step, make_fifo_plan
    from moca_tpu.sampling.moca import MoCAConfig
    from moca_tpu.schedule import make_schedule

    f, n_part = 4, 2
    mesh = make_mesh((2, 4))
    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, temporal_length=f)
    unet = UNet3D(cfg)
    h = w = 8
    B = 2
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, f, h, w, 4)),
                       jnp.zeros((1, f), jnp.int32),
                       jnp.zeros((1, 7, cfg.context_dim)), fps=16)
    sch = make_schedule(ddim_num_steps=f * n_part, ddim_eta=1.0)
    import numpy as _np
    plan = make_fifo_plan(_np.asarray(sch.ddim_timesteps), f, n_part, True)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.context_dim))
    uc = jnp.zeros_like(ctx)
    latents = jax.random.normal(jax.random.PRNGKey(2),
                                (B, plan.queue_length, h, w, 4))

    def apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    def run(unet_apply):
        eps_fn = make_cfg_eps_fn(unet_apply, params, ctx, uc, 7.5)
        return fifo_step(eps_fn, sch, plan, MoCAConfig(), latents,
                         jax.random.PRNGKey(3))

    plain_latents, plain_head = jax.jit(lambda: run(apply))()
    sharded_apply = make_sharded_unet_apply(apply, mesh)
    with jax.set_mesh(mesh):
        sh_latents, sh_head = jax.jit(lambda: run(sharded_apply))()
    np.testing.assert_allclose(np.asarray(sh_latents),
                               np.asarray(plain_latents), atol=2e-5)
    np.testing.assert_allclose(np.asarray(sh_head), np.asarray(plain_head),
                               atol=2e-5)


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


def test_sharded_fifo_step_seg_path_matches_unsharded():
    """The injection + pre-injection-pred path (masks, cond_image,
    with_pred_x0 — the open-vocab loop's device side) must be identical
    under the mesh, including on a pure-fifo (1, 8) mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import numpy as np
    from moca_tpu.models.unet3d import UNetConfig, UNet3D
    from moca_tpu.sampling.ddim import make_cfg_eps_fn
    from moca_tpu.sampling.fifo import fifo_step, make_fifo_plan
    from moca_tpu.sampling.moca import MoCAConfig
    from moca_tpu.schedule import make_schedule

    f, n_part = 4, 2
    mesh = make_mesh((1, 8))  # pure fifo-axis mesh
    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, temporal_length=f)
    unet = UNet3D(cfg)
    h = w = 8
    params = unet.init(jax.random.PRNGKey(0), jnp.zeros((1, f, h, w, 4)),
                       jnp.zeros((1, f), jnp.int32),
                       jnp.zeros((1, 7, cfg.context_dim)), fps=16)
    sch = make_schedule(ddim_num_steps=f * n_part, ddim_eta=1.0)
    plan = make_fifo_plan(np.asarray(sch.ddim_timesteps), f, n_part, True)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, cfg.context_dim))
    uc = jnp.zeros_like(ctx)
    latents = jax.random.normal(jax.random.PRNGKey(2),
                                (1, plan.queue_length, h, w, 4))
    masks = (jax.random.uniform(jax.random.PRNGKey(4),
                                (1, plan.queue_length, h, w, 1)) > 0.5
             ).astype(jnp.float32)
    cond = jnp.full((h, w, 4), 0.3)

    def apply(p, xx, tt, cc, fps=16):
        return unet.apply(p, xx, tt, cc, fps=fps)

    def run(unet_apply):
        eps_fn = make_cfg_eps_fn(unet_apply, params, ctx, uc, 7.5)
        return fifo_step(eps_fn, sch, plan, MoCAConfig(), latents,
                         jax.random.PRNGKey(3), cond_image=cond,
                         masks=masks, masks_are_davis=True, gamma=0.4,
                         with_pred_x0=True)

    plain = jax.jit(lambda: run(apply))()
    sharded_apply = make_sharded_unet_apply(apply, mesh)
    with jax.set_mesh(mesh):
        sharded = jax.jit(lambda: run(sharded_apply))()
    for a, b in zip(plain, sharded):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=2e-5)
