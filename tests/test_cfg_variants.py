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


# ---------------------------------------------------------------------------
# DiffusionWrapper conditioning-key dispatch (ddpm3d.py:696-763)
# ---------------------------------------------------------------------------

def _dispatch_model(in_channels=4, context_dim=16):
    """LatentDiffusion with a tiny U-Net built for the given conditioning
    shape (concat modes need in_channels=4+Cc; 'concat'/None need
    context_dim=None → the spatial transformers self-attend)."""
    from moca_tpu.models.clip_text import CLIPTextConfig
    from moca_tpu.models.latent_diffusion import LatentDiffusion
    from moca_tpu.models.unet3d import UNetConfig, UNet3D
    from moca_tpu.models.vae import VAEConfig
    from test_models import randomize_zero_params

    cfg = UNetConfig(in_channels=in_channels, out_channels=4,
                     model_channels=32, num_head_channels=8,
                     context_dim=context_dim, channel_mult=(1, 2),
                     attention_resolutions=(1, 2), num_res_blocks=1,
                     temporal_length=2)
    unet = UNet3D(cfg)
    x = jnp.zeros((1, 2, 8, 8, in_channels))
    ts = jnp.zeros((1, 2), jnp.int32)
    ctx = None if context_dim is None else jnp.zeros((1, 7, context_dim))
    params = randomize_zero_params(
        unet.init(jax.random.PRNGKey(0), x, ts, ctx, fps=16))
    return LatentDiffusion(
        cfg, VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                       resolution=32),
        CLIPTextConfig(width=16, heads=2, layers=2), params, None, None)


def test_apply_model_crossattn_token_concat():
    """'crossattn' concatenates the c_crossattn list on the token axis
    (ddpm3d.py:710-712) — must equal a manual concat through apply_unet."""
    model = _dispatch_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    out = model.apply_model(model.unet_params, x, ts, c_crossattn=[c1, c2],
                            conditioning_key="crossattn")
    ref = model.apply_unet(model.unet_params, x, ts,
                           jnp.concatenate([c1, c2], axis=1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    # context actually conditions the output
    out2 = model.apply_model(model.unet_params, x, ts, c_crossattn=[c2, c1],
                             conditioning_key="crossattn")
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_apply_model_hybrid():
    """'hybrid' = channel concat + crossattn context (ddpm3d.py:713-717):
    both conditionings reach the U-Net."""
    model = _dispatch_model(in_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    cc = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    out = model.apply_model(model.unet_params, x, ts, c_concat=[cc],
                            c_crossattn=[ctx], conditioning_key="hybrid")
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    out_cc = model.apply_model(model.unet_params, x, ts, c_concat=[cc * 2],
                               c_crossattn=[ctx], conditioning_key="hybrid")
    out_ctx = model.apply_model(model.unet_params, x, ts, c_concat=[cc],
                                c_crossattn=[ctx * 2],
                                conditioning_key="hybrid")
    assert not np.allclose(np.asarray(out), np.asarray(out_cc))
    assert not np.allclose(np.asarray(out), np.asarray(out_ctx))


def test_apply_model_concat_and_uncond():
    """'concat' (channel concat, no context — the spatial cross-attention
    self-attends, ddpm3d.py:707-709) and the None key (:705-706)."""
    model = _dispatch_model(in_channels=8, context_dim=None)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    cc = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    out = model.apply_model(model.unet_params, x, ts, c_concat=[cc],
                            conditioning_key="concat")
    assert out.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out)).all()
    out2 = model.apply_model(model.unet_params, x, ts, c_concat=[cc * 2],
                             conditioning_key="concat")
    assert not np.allclose(np.asarray(out), np.asarray(out2))

    plain = _dispatch_model(in_channels=4, context_dim=None)
    out_un = plain.apply_model(plain.unet_params, x, ts,
                               conditioning_key=None)
    assert out_un.shape == (1, 2, 8, 8, 4)
    assert np.isfinite(np.asarray(out_un)).all()


def test_apply_model_resblockcond():
    """'resblockcond' (ddpm3d.py:718-720) feeds c_crossattn[0] — ONLY the
    first tensor, no token concat — as the cross-attention context (the
    ResBlock routing of the name is vestigial with this U-Net family):
    single-context must equal 'crossattn', multi-context must ignore the
    extras."""
    model = _dispatch_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 16))
    out = model.apply_model(model.unet_params, x, ts, c_crossattn=[c1],
                            conditioning_key="resblockcond")
    ref = model.apply_model(model.unet_params, x, ts, c_crossattn=[c1],
                            conditioning_key="crossattn")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)
    multi = model.apply_model(model.unet_params, x, ts,
                              c_crossattn=[c1, c2],
                              conditioning_key="resblockcond")
    np.testing.assert_allclose(np.asarray(multi), np.asarray(out),
                               atol=1e-6)
    both = model.apply_model(model.unet_params, x, ts, c_crossattn=[c1, c2],
                             conditioning_key="crossattn")
    assert not np.allclose(np.asarray(multi), np.asarray(both))


def test_apply_model_vestigial_keys_reference_semantics():
    """The 7 y/s/mask modes (ddpm3d.py:721-762) behave EXACTLY like the
    reference model family: the concat/context wiring applies, the y/s/mask
    values are discarded (the reference U-Net's forward swallows them via
    **kwargs, openaimodel3d.py:534), and the reference's argument checks
    fire. Pin each mode against its functional equivalent."""
    model = _dispatch_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    y = jnp.ones((1, 4))

    def run(m, key, **kw):
        return np.asarray(m.apply_model(m.unet_params, x, ts,
                                        conditioning_key=key, **kw))

    # 'adm': y = c_crossattn[0] is swallowed → unconditional forward.
    # An adm model is built WITHOUT cross-attention context (context=None
    # reaches the network), like the reference's class-conditional LDMs.
    plain = _dispatch_model(in_channels=4, context_dim=None)
    uncond = run(plain, None)
    np.testing.assert_array_equal(run(plain, "adm", c_crossattn=[c1]),
                                  uncond)
    with pytest.raises(TypeError):  # reference subscripts None the same way
        run(plain, "adm")

    # hybrid-time / hybrid-adm / hybrid-time-adm ≡ 'hybrid' (s/y swallowed)
    hyb = _dispatch_model(in_channels=8)
    cc = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 4))
    hybrid = run(hyb, "hybrid", c_concat=[cc], c_crossattn=[c1])
    np.testing.assert_array_equal(
        run(hyb, "hybrid-time", c_concat=[cc], c_crossattn=[c1], s=y),
        hybrid)
    np.testing.assert_array_equal(
        run(hyb, "hybrid-adm", c_concat=[cc], c_crossattn=[c1], c_adm=y),
        hybrid)
    np.testing.assert_array_equal(
        run(hyb, "hybrid-time-adm", c_concat=[cc], c_crossattn=[c1],
            c_adm=y, s=y), hybrid)
    # the reference's asserts fire on the missing required args
    with pytest.raises(AssertionError):
        run(hyb, "hybrid-time", c_concat=[cc], c_crossattn=[c1])
    with pytest.raises(AssertionError):
        run(hyb, "hybrid-adm", c_concat=[cc], c_crossattn=[c1])
    with pytest.raises(AssertionError):
        run(hyb, "hybrid-time-adm", c_concat=[cc], c_crossattn=[c1], s=y)

    # hybrid-adm-mask: optional c_concat (ddpm3d.py:749-753) — with it,
    # ≡ hybrid; without, ≡ crossattn
    np.testing.assert_array_equal(
        run(hyb, "hybrid-adm-mask", c_concat=[cc], c_crossattn=[c1],
            s=y, mask=y), hybrid)
    crossattn = run(model, "crossattn", c_crossattn=[c1])
    np.testing.assert_array_equal(
        run(model, "hybrid-adm-mask", c_crossattn=[c1], s=y, mask=y),
        crossattn)

    # concat-time-mask / concat-adm-mask ≡ 'concat' (context=None)
    cat = _dispatch_model(in_channels=8, context_dim=None)
    concat = run(cat, "concat", c_concat=[cc])
    np.testing.assert_array_equal(
        run(cat, "concat-time-mask", c_concat=[cc], s=y, mask=y), concat)
    np.testing.assert_array_equal(
        run(cat, "concat-adm-mask", c_concat=[cc], s=y, mask=y), concat)
    # concat-adm-mask tolerates c_concat=None (ddpm3d.py:742-746)
    np.testing.assert_array_equal(
        run(plain, "concat-adm-mask", s=y, mask=y), uncond)

    with pytest.raises(NotImplementedError, match="unknown"):
        run(model, "bogus")


def test_apply_model_kwargs_quirk_fps_only_concat_crossattn():
    """DiffusionWrapper.forward forwards its **kwargs (carrying fps) ONLY
    in the 'concat' (ddpm3d.py:709) and 'crossattn' (:712) branches; every
    other mode calls the U-Net without them, so an fps-conditioned model
    embeds the default fps=16 whatever the caller asked for. Mirror-pin
    both sides of the quirk."""
    model = _dispatch_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))

    def run(m, key, **kw):
        return np.asarray(m.apply_model(m.unet_params, x, ts,
                                        conditioning_key=key, **kw))

    # crossattn: fps reaches the fps_cond embedding
    assert not np.allclose(
        run(model, "crossattn", c_crossattn=[c1], fps=99),
        run(model, "crossattn", c_crossattn=[c1], fps=16))
    # hybrid (and every non-concat/crossattn mode): fps is dropped
    hyb = _dispatch_model(in_channels=8)
    cc = jax.random.normal(jax.random.PRNGKey(4), (1, 2, 8, 8, 4))
    np.testing.assert_array_equal(
        run(hyb, "hybrid", c_concat=[cc], c_crossattn=[c1], fps=99),
        run(hyb, "hybrid", c_concat=[cc], c_crossattn=[c1], fps=16))
    np.testing.assert_array_equal(
        run(model, "resblockcond", c_crossattn=[c1], fps=99),
        run(model, "resblockcond", c_crossattn=[c1], fps=16))


def test_config_conditioning_key_surface():
    """The YAML surface accepts every reference DiffusionWrapper mode and
    rejects non-reference keys at parse time with the key named."""
    from moca_tpu.config import DiffusionParams
    from moca_tpu.models.latent_diffusion import (
        IMPLEMENTED_CONDITIONING_KEYS, VESTIGIAL_CONDITIONING_KEYS)

    for key in IMPLEMENTED_CONDITIONING_KEYS:
        assert DiffusionParams(conditioning_key=key).conditioning_key == key
    assert set(VESTIGIAL_CONDITIONING_KEYS) < set(
        IMPLEMENTED_CONDITIONING_KEYS)
    with pytest.raises(NotImplementedError, match="wavelet"):
        DiffusionParams(conditioning_key="wavelet")
