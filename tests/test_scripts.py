"""Utility-script coverage (ref: analyze_results.py, utils/v2i.py,
convert_gifs.py) — exercised as importable functions / subprocesses on
synthetic inputs."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_analyze_results_weighted_averages(tmp_path):
    """Weighted per-dimension averages on the 1-5 scale
    (ref analyze_results.py:22-65 semantics)."""
    ar = _load("analyze_results")
    csv_path = tmp_path / "responses.csv"
    csv_path.write_text(
        "Timestamp,Blending quality [MoCA],Video Consistency [MoCA],"
        "Character consistency [MoCA],Overall quality [MoCA]\n"
        "t1,5,4,4 - good,3\n"
        "t2,3,4,5,5\n"
        "t3,4 stars,2,3,4\n")
    out = ar.analyze(str(csv_path))
    assert out["BQ"] == 4.0       # (5+3+4)/3
    assert out["VC"] == round(10 / 3, 3)
    assert out["CC"] == 4.0       # (4+5+3)/3
    assert out["OQ"] == 4.0


def test_analyze_results_ignores_out_of_range_and_unclassified(tmp_path):
    ar = _load("analyze_results")
    csv_path = tmp_path / "r.csv"
    csv_path.write_text(
        "Timestamp,Blending [A],Unrelated column\n"
        "t,7,5\n"      # 7 out of 1-5 range → dropped; unrelated → dropped
        "t,2,1\n")
    out = ar.analyze(str(csv_path))
    assert out == {"BQ": 2.0}


def test_convert_gifs_roundtrip(tmp_path):
    import imageio

    from moca_tpu.io.video import load_video_frames

    cg = _load("convert_gifs")
    gif = tmp_path / "clip.gif"
    frames = [np.full((32, 48, 3), 40 * i, np.uint8) for i in range(5)]
    imageio.mimsave(str(gif), frames, duration=100)
    out = cg.convert(str(gif), fps=10)
    assert out.endswith(".mp4") and os.path.exists(out)
    back = load_video_frames(out)
    assert back.shape[0] == 5 and back.shape[1:] == (32, 48, 3)


def test_v2i_extracts_frames(tmp_path):
    from moca_tpu.io.video import save_video

    mp4 = tmp_path / "v.mp4"
    frames = [np.full((32, 48, 3), 30 * i, np.uint8) for i in range(6)]
    save_video(frames, str(mp4), fps=10)
    outdir = tmp_path / "frames"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "v2i.py"),
         "--video_path", str(mp4), "--output_dir", str(outdir),
         "--frame_rate", "2", "--image_format", "png"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-500:]
    # reference flag surface + frame_{N:06d}.{format} naming (utils/v2i.py)
    pngs = sorted(os.listdir(outdir))
    assert pngs == ["frame_000000.png", "frame_000001.png",
                    "frame_000002.png"]


def test_generate_condition_images(tmp_path, monkeypatch):
    """TPU-native stand-in for scripts/prep/generate_condition_images.py
    (the reference shells out to diffusers SD2.1): missing conditioned
    images are sampled from the in-house T2V stack as single frames."""
    import jax

    from moca_tpu.config import ModelConfig, DiffusionParams
    import moca_tpu.config as config_mod
    import moca_tpu.io.checkpoint as ckpt_mod
    import moca_tpu.models.tokenizer as tok_mod
    from moca_tpu.models.clip_text import CLIPTextConfig
    from moca_tpu.models.latent_diffusion import init_random_model
    from moca_tpu.models.tokenizer import HashTokenizer
    from moca_tpu.models.unet3d import UNetConfig
    from moca_tpu.models.vae import VAEConfig

    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=4)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=32)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    model = init_random_model(unet_cfg, vae_cfg, clip_cfg,
                              jax.random.PRNGKey(0), latent_hw=(4, 4),
                              frames=4)
    cfg = ModelConfig(diffusion=DiffusionParams(), unet=unet_cfg,
                      vae=vae_cfg, clip=clip_cfg)
    monkeypatch.setattr(config_mod, "load_model_config", lambda *a, **k: cfg)
    monkeypatch.setattr(
        ckpt_mod, "load_or_convert",
        lambda *a, **k: (model.unet_params, model.vae_params,
                         model.clip_params))
    monkeypatch.setattr(tok_mod, "load_tokenizer",
                        lambda *a: HashTokenizer())

    out_img = tmp_path / "assets" / "gen_cat.png"
    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "prompt,conditioned_object,conditioned_image_path,"
        "conditioned_prompt,gamma\n"
        f"a red fox,cat,{out_img},a cat,0.4\n")
    gen = _load("generate_condition_images")
    monkeypatch.setattr(sys, "argv", [
        "generate_condition_images.py", "--ckpt_path", "/x.ckpt",
        "--prompts_file", str(csv), "--assets_dir",
        str(tmp_path / "assets"), "--height", "32", "--width", "32",
        "--num_steps", "2"])
    gen.main()
    assert out_img.exists()
    from PIL import Image

    img = Image.open(out_img)
    assert img.mode == "RGBA" and img.size == (32, 32)

    # second run: everything present → early exit, file untouched
    mtime = out_img.stat().st_mtime_ns
    gen.main()
    assert out_img.stat().st_mtime_ns == mtime
