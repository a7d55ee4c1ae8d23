"""Batch-inference CLI e2e for the i2v mode (ref:
scripts/evaluation/inference.py:110-117 — per-prompt conditioning images
whose CLIP tokens are concatenated to the text context), driven through
`cli.inference.main` with a tiny random LatentVisualDiffusion injected in
place of the checkpoint loader."""

from __future__ import annotations

import os

import numpy as np
import pytest
from PIL import Image

import jax

import moca_tpu.cli.inference as inf
from moca_tpu.config import DiffusionParams, ModelConfig
from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.clip_vision import CLIPVisionConfig
from moca_tpu.models.latent_diffusion import init_random_visual_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig

HEIGHT, WIDTH, F = 32, 32, 4


@pytest.fixture(scope="module", params=[False, True],
                ids=["imageproj", "finegrained"])
def tiny_i2v_setup(request):
    finegrained = request.param
    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=F, use_image_attention=True)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=HEIGHT)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    vision_cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=16,
                                  heads=2, layers=2, output_dim=16)
    model = init_random_visual_model(
        unet_cfg, vae_cfg, clip_cfg, vision_cfg, jax.random.PRNGKey(0),
        latent_hw=(HEIGHT // 8, WIDTH // 8), frames=F,
        finegrained=finegrained)
    cfg = ModelConfig(diffusion=DiffusionParams(), unet=unet_cfg,
                      vae=vae_cfg, clip=clip_cfg, is_i2v=True,
                      finegrained=finegrained)
    return model, cfg


def _write_images(d, n=2):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8),
            mode="RGB").save(os.path.join(d, f"cond_{i}.png"))
    # stray non-image entries must be ignored by the CLI's ext filter (the
    # reference's get_filelist glob, inference.py:82) — without it these
    # would crash the loader / shift the prompt↔image pairing
    with open(os.path.join(d, "notes.txt"), "w") as f:
        f.write("not an image")
    with open(os.path.join(d, ".DS_Store"), "wb") as f:
        f.write(b"\x00")


def _run(args_list, setup, monkeypatch, tmp_path):
    model, cfg = setup
    monkeypatch.setattr(inf, "load_model_config", lambda *a, **k: cfg)
    monkeypatch.setattr(inf, "_load_i2v_model", lambda *a, **k: model)
    monkeypatch.setattr(inf, "load_tokenizer", lambda *a: HashTokenizer())
    prompt_file = tmp_path / "prompts.txt"
    prompt_file.write_text("a red fox\na blue bird\n")
    img_dir = tmp_path / "cond"
    _write_images(str(img_dir))
    savedir = tmp_path / "out"
    args = inf.build_parser().parse_args([
        "--ckpt_path", "/nonexistent.ckpt",
        "--prompt_file", str(prompt_file),
        "--savedir", str(savedir),
        # the reference's flag name (inference.py:38) — aliased to
        # --cond_image_dir
        "--mode", "i2v", "--cond_input", str(img_dir),
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--frames", str(F), "--ddim_steps", str(F),
    ] + args_list)
    inf.main(args)
    return savedir


def test_i2v_writes_one_mp4_per_prompt(tiny_i2v_setup, monkeypatch,
                                       tmp_path):
    savedir = _run([], tiny_i2v_setup, monkeypatch, tmp_path)
    vids = sorted(os.listdir(savedir))
    # i2v outputs are named after the conditioning-image stem, like the
    # reference (inference.py:84)
    assert vids == ["cond_0.mp4", "cond_1.mp4"]
    assert all((savedir / v).stat().st_size > 0 for v in vids)


def test_i2v_image_tokens_change_output(tiny_i2v_setup, monkeypatch,
                                        tmp_path):
    """The conditioning image must actually reach the U-Net: the same
    prompt/seed with different images yields different videos. Uses the
    pipeline surface directly (model.get_image_embeds → image_tokens),
    the exact call chain of inference.py's i2v loop."""
    from test_models import randomize_zero_params

    from moca_tpu.pipelines.t2v import T2VPipeline

    model, _ = tiny_i2v_setup
    # fresh random models are identity functions (zero-init last layers,
    # reference parity) — randomize so sensitivity is observable
    orig = model.unet_params
    model.unet_params = randomize_zero_params(orig)
    try:
        pipe = T2VPipeline.build(model, HashTokenizer(), num_steps=F,
                                 guidance_scale=7.5)
        key = jax.random.PRNGKey(1)
        img_a = np.full((40, 40, 3), -0.5, np.float32)
        img_b = np.full((40, 40, 3), 0.5, np.float32)
        tok_a = model.get_image_embeds(img_a[None])
        tok_b = model.get_image_embeds(img_b[None])
        va = pipe("a red fox", key, height=HEIGHT, width=WIDTH, frames=F,
                  image_tokens=tok_a)
        vb = pipe("a red fox", key, height=HEIGHT, width=WIDTH, frames=F,
                  image_tokens=tok_b)
        assert not np.allclose(np.asarray(va), np.asarray(vb))
    finally:
        model.unet_params = orig


def test_i2v_rejects_prompt_image_count_mismatch(tiny_i2v_setup,
                                                 monkeypatch, tmp_path):
    """One conditioning image per prompt (the reference's assert,
    inference.py:83) — a mismatch must fail loudly instead of wrapping
    around and overwriting stem-named outputs."""
    model, cfg = tiny_i2v_setup
    monkeypatch.setattr(inf, "load_model_config", lambda *a, **k: cfg)
    monkeypatch.setattr(inf, "_load_i2v_model", lambda *a, **k: model)
    monkeypatch.setattr(inf, "load_tokenizer", lambda *a: HashTokenizer())
    prompt_file = tmp_path / "prompts.txt"
    prompt_file.write_text("a red fox\na blue bird\na green frog\n")
    img_dir = tmp_path / "cond"
    _write_images(str(img_dir), n=2)  # 3 prompts, 2 images
    args = inf.build_parser().parse_args([
        "--ckpt_path", "/nonexistent.ckpt",
        "--prompt_file", str(prompt_file),
        "--savedir", str(tmp_path / "out"),
        "--mode", "i2v", "--cond_input", str(img_dir),
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--frames", str(F), "--ddim_steps", str(F),
    ])
    with pytest.raises(AssertionError, match="NOT match"):
        inf.main(args)


def test_i2v_requires_cond_image_dir(tiny_i2v_setup, monkeypatch, tmp_path):
    model, cfg = tiny_i2v_setup
    monkeypatch.setattr(inf, "load_model_config", lambda *a, **k: cfg)
    monkeypatch.setattr(inf, "_load_i2v_model", lambda *a, **k: model)
    monkeypatch.setattr(inf, "load_tokenizer", lambda *a: HashTokenizer())
    prompt_file = tmp_path / "prompts.txt"
    prompt_file.write_text("a red fox\n")
    args = inf.build_parser().parse_args([
        "--ckpt_path", "/nonexistent.ckpt",
        "--prompt_file", str(prompt_file),
        "--savedir", str(tmp_path / "out"),
        "--mode", "i2v",
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--frames", str(F), "--ddim_steps", str(F),
    ])
    with pytest.raises(AssertionError, match="cond_image_dir"):
        inf.main(args)
