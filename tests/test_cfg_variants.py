"""CFG variants: uc_type formulas + temporal guidance (intended semantics)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.sampling.ddim import make_cfg_eps_fn


def _apply(params, x, t, ctx, fps=16, no_temporal_attn=False):
    # deterministic fake denoiser: cond/uncond distinguished by PER-SAMPLE
    # ctx mean (the CFG batch interleaves cond/uncond rows); temporal path
    # adds a constant when temporal layers are "on"
    per_sample = jnp.mean(ctx, axis=(1, 2)).astype(x.dtype)
    base = x * 0.5 + per_sample[:, None, None, None, None]
    if not no_temporal_attn:
        base = base + 0.25
    return base


X = jnp.ones((2, 4, 8, 8, 4))
T = jnp.zeros((2, 4), jnp.int32)
CTX = jnp.ones((1, 7, 16)) * 2.0
UC = jnp.zeros((1, 7, 16))


def _manual(e_c, e_u, s, uc_type):
    if uc_type is None:
        return e_u + s * (e_c - e_u)
    if uc_type == "cfg_original":
        return e_c + s * (e_c - e_u)
    return e_c + s * (e_u - e_c)


@pytest.mark.parametrize("uc_type", [None, "cfg_original", "cfg_ours"])
def test_uc_type_formulas(uc_type):
    s = 7.5
    fn = make_cfg_eps_fn(_apply, None, CTX, UC, s, uc_type=uc_type)
    got = fn(X, T)
    e_c = _apply(None, X, T, CTX)
    e_u = _apply(None, X, T, UC)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(_manual(e_c, e_u, s, uc_type)),
                               rtol=1e-6)


def test_temporal_guidance():
    """e += s_t·(e_temporal − e_image): with the fake denoiser the temporal
    branch differs by the constant 0.25 → shift of s_t·0.25."""
    base = make_cfg_eps_fn(_apply, None, CTX, UC, 7.5)(X, T)
    guided = make_cfg_eps_fn(_apply, None, CTX, UC, 7.5,
                             temporal_guidance_scale=2.0)(X, T)
    np.testing.assert_allclose(np.asarray(guided - base), 2.0 * 0.25,
                               rtol=1e-5)


def test_no_temporal_attn_skips_layers():
    """UNet with temporal layers: the flag changes the output at apply time
    (unlike the reference, which swallows it — DECISIONS.md)."""
    from moca_tpu.models.unet3d import UNetConfig, UNet3D
    from test_models import randomize_zero_params

    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, temporal_length=4)
    m = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    ts = jnp.full((1, 4), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (1, 7, 16))
    params = randomize_zero_params(
        m.init(jax.random.PRNGKey(2), x, ts, ctx, fps=16))
    y_full = m.apply(params, x, ts, ctx, fps=16)
    y_img = m.apply(params, x, ts, ctx, fps=16, no_temporal_attn=True)
    assert not np.allclose(np.asarray(y_full), np.asarray(y_img))
