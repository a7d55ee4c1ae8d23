"""End-to-end smoke: tiny random-weight model through T2V and MoCA pipelines.

Mirrors the reference's CPU-unrunnable main path (videocrafter_main.py) at
toy scale: prompt → CLIP → base DDIM → FIFO queue → MoCA injection → decode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline
from moca_tpu.pipelines.t2v import T2VPipeline
from moca_tpu.sampling.moca import MoCAConfig


HEIGHT, WIDTH = 32, 32  # latent 4×4
F, N = 4, 2


@pytest.fixture(scope="module")
def tiny_model():
    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=F)
    # 4 levels → 3 downsamples → the 8× factor the pipelines assume
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=HEIGHT)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    return init_random_model(
        unet_cfg, vae_cfg, clip_cfg, jax.random.PRNGKey(0),
        latent_hw=(HEIGHT // 8, WIDTH // 8), frames=F)


def test_t2v_pipeline(tiny_model):
    pipe = T2VPipeline.build(
        tiny_model, HashTokenizer(), num_steps=F * N, guidance_scale=7.5)
    video = pipe("a cat", jax.random.PRNGKey(1),
                 height=HEIGHT, width=WIDTH, frames=F)
    assert video.shape == (F, HEIGHT, WIDTH, 3)
    assert np.isfinite(np.asarray(video)).all()


def test_t2v_pipeline_batched_prompts(tiny_model):
    """The reference's --bs batching (inference.py:30,92-101): B prompts
    in one DDIM scan → [B, T, H, W, 3]; each row ≈ its single-prompt run
    (same shared noise; tolerance for cross-batch-size XLA programs)."""
    pipe = T2VPipeline.build(
        tiny_model, HashTokenizer(), num_steps=F * N, guidance_scale=7.5)
    key = jax.random.PRNGKey(8)
    videos = pipe(["a cat", "a dog"], key,
                  height=HEIGHT, width=WIDTH, frames=F)
    assert videos.shape == (2, F, HEIGHT, WIDTH, 3)
    single = pipe("a cat", key, height=HEIGHT, width=WIDTH, frames=F)
    np.testing.assert_allclose(np.asarray(videos[0]), np.asarray(single),
                               atol=1e-4)


def test_freeinit_resample_honors_cfg_variants(tiny_model):
    """The FreeInit re-sample entry (_ddim_from_xt_jit, iterations 2+) must
    guide with the SAME uc_type as the first draw (regression: it used to
    drop uc_type/temporal_cfg_scale, silently reverting re-samples to
    standard CFG)."""
    import dataclasses

    from test_models import randomize_zero_params

    from moca_tpu.pipelines.t2v import ddim_from_xt

    orig = tiny_model.unet_params
    tiny_model.unet_params = randomize_zero_params(orig)
    try:
        pipe = T2VPipeline.build(tiny_model, HashTokenizer(),
                                 num_steps=F * N, guidance_scale=7.5)
        ctx = pipe.encode_prompts(["a cat"])
        uc = pipe.uncond_context(1, like=ctx)
        x_T = jax.random.normal(jax.random.PRNGKey(3),
                                (1, F, HEIGHT // 8, WIDTH // 8, 4))
        base, _ = ddim_from_xt(pipe, (ctx, uc), x_T)
        alt = dataclasses.replace(pipe, uc_type="cfg_original")
        out, _ = ddim_from_xt(alt, (ctx, uc), x_T)
        assert not np.allclose(np.asarray(base), np.asarray(out))
    finally:
        tiny_model.unet_params = orig


def test_moca_pipeline_prompt_mode(tiny_model, tmp_path):
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5)
    h, w = HEIGHT // 8, WIDTH // 8
    cond_image = np.full((h, w, 4), 0.2, np.float32)
    frames = pipe(
        "a mouse", jax.random.PRNGKey(2), cond_image=cond_image,
        conditioned_prompt="a cat", gamma=0.5,
        height=HEIGHT, width=WIDTH, latents_dir=str(tmp_path))
    expected = 3 + F * N - F
    assert len(frames) == expected
    assert frames[0].shape == (HEIGHT, WIDTH, 3)
    assert all(np.isfinite(f).all() for f in frames)
    # latent cache written for resume (videocrafter_main.py:201 contract)
    assert (tmp_path / f"{F * N}.npz").exists()


def test_moca_pipeline_davis_mode(tiny_model):
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=2, guidance_scale=7.5,
        moca=MoCAConfig(inject_into_queue=True))
    h, w = HEIGHT // 8, WIDTH // 8
    T0 = 6
    # fake DAVIS: encoded real-video latents + binary masks
    clean = jax.random.normal(jax.random.PRNGKey(3), (1, T0, h, w, 4)) * 0.1
    masks = (np.random.default_rng(0).random((T0, h, w)) > 0.5).astype(np.float32)
    cond_image = np.full((h, w, 4), 0.2, np.float32)
    davis_frames = jax.random.uniform(
        jax.random.PRNGKey(5), (T0, HEIGHT, WIDTH, 3), minval=-1, maxval=1)
    frames = pipe(
        "object moving", jax.random.PRNGKey(4), cond_image=cond_image,
        height=HEIGHT, width=WIDTH, clean_latents=clean, masks=masks,
        davis_frames=davis_frames)
    assert len(frames) == 2 + F * N - F
    assert all(np.isfinite(f).all() for f in frames)


def test_moca_pipeline_batched_prompts_match_single(tiny_model):
    """Batched-prompt DP: B=2 prompts riding one queue reproduce two B=1
    runs. Noise is shared across the prompt batch (ddim.shared_normal)
    exactly as the reference's identically-seeded DDP ranks consume
    identical noise streams (videocrafter_main.py:62, ddp_wrapper.py).

    Tolerance, not bit-equality: XLA compiles DIFFERENT programs for the
    B·R vs R U-Net batch (fusion/tiling choices change with the leading
    dim), so per-sample float accumulation differs at the ~1e-06 level —
    same-program runs (e.g. sharded vs unsharded at fixed batch,
    test_pipeline_sharding) are the ones that pin bit-equality."""
    from test_models import randomize_zero_params

    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5)
    key = jax.random.PRNGKey(7)
    h, w = HEIGHT // 8, WIDTH // 8
    cond_image = np.full((h, w, 4), 0.2, np.float32)
    prompts = ["a mouse", "a spotted dog"]
    # randomize the zero-initialized output layers: at plain random init
    # the U-Net is an identity function and prompts have NO effect (see
    # CLAUDE.md / test_models) — the distinctness check below needs a
    # context-sensitive model
    orig = tiny_model.unet_params
    tiny_model.unet_params = randomize_zero_params(orig)
    try:
        batched = pipe(prompts, key, cond_image=cond_image, gamma=0.5,
                       height=HEIGHT, width=WIDTH)
        assert isinstance(batched, list) and len(batched) == 2
        for p, bstream in zip(prompts, batched):
            single = pipe(p, key, cond_image=cond_image, gamma=0.5,
                          height=HEIGHT, width=WIDTH)
            assert len(bstream) == len(single)
            for bf, sf in zip(bstream, single):
                np.testing.assert_allclose(bf, sf, atol=1e-4)
        # the batch really carries DISTINCT prompt streams (shared noise
        # must not collapse them into one)
        assert np.abs(np.asarray(batched[0][0])
                      - np.asarray(batched[1][0])).max() > 1e-3
    finally:
        tiny_model.unet_params = orig


def test_moca_pipeline_batched_prompts_reject_host_state_modes(tiny_model):
    """Per-stream host-state modes (DAVIS masks, multiprompts, open-vocab
    provider, viz) are B=1 only — the rejection is explicit."""
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=2, guidance_scale=7.5)
    with pytest.raises(ValueError, match="batched prompts"):
        pipe(["a", "b"], jax.random.PRNGKey(0), height=HEIGHT, width=WIDTH,
             multiprompts=[("a", 2), ("b", 2)])


def test_moca_pipeline_no_lookahead(tiny_model, tmp_path):
    """funcs.py:306-354 non-lookahead branch: n windows, head slot 0."""
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=2, guidance_scale=7.5, lookahead_denoising=False)
    assert pipe.plan.num_windows == N
    assert pipe.plan.head_slot == 0
    frames = pipe("a mouse", jax.random.PRNGKey(9),
                  height=HEIGHT, width=WIDTH, latents_dir=str(tmp_path))
    assert len(frames) == 2 + F * N - F
    assert all(np.isfinite(f).all() for f in frames)


def test_moca_pipeline_multiprompt(tiny_model, tmp_path):
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5)
    frames = pipe(
        "scene one", jax.random.PRNGKey(5),
        height=HEIGHT, width=WIDTH, latents_dir=str(tmp_path),
        multiprompts=[("scene one", 2), ("scene two", 2)])
    assert len(frames) == 4 + F * N - F


def test_moca_pipeline_viz_artifacts(tiny_model, tmp_path):
    """viz sink through the real pipeline: per-iteration pred_x0/mask/cond
    PNGs mirroring the reference's inline dumps (ddim.py:611-641,849-899)."""
    from moca_tpu.utils.visualization import VisualizationSink

    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=2, guidance_scale=7.5)
    h, w = HEIGHT // 8, WIDTH // 8
    cond_image = np.full((h, w, 4), 0.2, np.float32)
    viz_dir = tmp_path / "visualizations"
    frames = pipe(
        "a mouse", jax.random.PRNGKey(6), cond_image=cond_image,
        conditioned_prompt="a cat", gamma=0.5,
        height=HEIGHT, width=WIDTH, latents_dir=str(tmp_path),
        viz=VisualizationSink(str(viz_dir)))
    assert len(frames) == 2 + F * N - F
    pngs = sorted((viz_dir / "pred_x0").glob("pred_x0_step_*_frame_*.png"))
    assert pngs, "no pred_x0 artifacts written"
    assert (viz_dir / "masks").exists()  # cond preview lands in masks dir
    assert list((viz_dir / "masks").glob("cond_image_step_*.png"))
