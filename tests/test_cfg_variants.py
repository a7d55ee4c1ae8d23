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


@pytest.fixture(scope="module")
def tiny_model():
    from moca_tpu.models.clip_text import CLIPTextConfig
    from moca_tpu.models.latent_diffusion import init_random_model
    from moca_tpu.models.unet3d import UNetConfig
    from moca_tpu.models.vae import VAEConfig

    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=2)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=32)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    return init_random_model(unet_cfg, vae_cfg, clip_cfg,
                             jax.random.PRNGKey(0), latent_hw=(4, 4),
                             frames=2)


def test_uncond_type_zero_embed(tiny_model):
    """uncond_type='zero_embed' (funcs.py:128-134, ddpm3d.py:397): the
    uncond context is zeros shaped like the cond context — including the
    token-concat case — and differs from empty_seq's embedding."""
    import jax.numpy as jnp

    from moca_tpu.models.tokenizer import HashTokenizer
    from moca_tpu.pipelines.t2v import T2VPipeline

    pipe_es = T2VPipeline.build(tiny_model, HashTokenizer(), num_steps=4)
    pipe_ze = T2VPipeline.build(tiny_model, HashTokenizer(), num_steps=4,
                                uncond_type="zero_embed")
    ctx = pipe_ze.encode_prompts(["a cat"])
    uc = pipe_ze.uncond_context(1, like=ctx)
    assert uc.shape == ctx.shape
    assert float(jnp.abs(uc).max()) == 0.0
    # empty_seq produces a genuine (non-zero) embedding
    uc_es = pipe_es.uncond_context(1, like=ctx)
    assert float(jnp.abs(uc_es).max()) > 0.0
    # doubled context (conditioned_prompt concat) → doubled zero uc
    ctx2 = jnp.concatenate([ctx, ctx], axis=1)
    assert pipe_ze.uncond_context(1, like=ctx2).shape == ctx2.shape
    # without a reference context it falls back to [B, 77, context_dim]
    assert pipe_ze.uncond_context(2).shape == (
        2, 77, tiny_model.unet_cfg.context_dim)
    import pytest

    with pytest.raises(NotImplementedError):
        T2VPipeline.build(tiny_model, HashTokenizer(), num_steps=4,
                          uncond_type="bogus").uncond_context(1)


def test_zero_embed_sampling_runs(tiny_model):
    """A short sample under zero_embed CFG stays finite and differs from
    the empty_seq sample (different uncond branch)."""
    import numpy as np

    import jax
    from moca_tpu.models.tokenizer import HashTokenizer
    from moca_tpu.pipelines.t2v import T2VPipeline

    vids = {}
    for ut in ("empty_seq", "zero_embed"):
        pipe = T2VPipeline.build(tiny_model, HashTokenizer(), num_steps=2,
                                 guidance_scale=7.5, uncond_type=ut)
        vids[ut] = np.asarray(pipe("a cat", jax.random.PRNGKey(0),
                                   height=32, width=32, frames=2))
        assert np.isfinite(vids[ut]).all()
