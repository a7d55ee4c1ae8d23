"""Batch-inference CLI e2e (ref: scripts/evaluation/inference.py +
ddp_wrapper.py): prompt-file sharding, n_samples, mp4 output — driven
through `cli.inference.main` with a tiny random model injected in place of
the checkpoint converter."""

from __future__ import annotations

import os

import numpy as np
import pytest

import moca_tpu.cli.inference as inf
from moca_tpu.config import ModelConfig, DiffusionParams
from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig

import jax

HEIGHT, WIDTH, F = 32, 32, 4


@pytest.fixture(scope="module")
def tiny_setup():
    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=F)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=HEIGHT)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    model = init_random_model(
        unet_cfg, vae_cfg, clip_cfg, jax.random.PRNGKey(0),
        latent_hw=(HEIGHT // 8, WIDTH // 8), frames=F)
    cfg = ModelConfig(diffusion=DiffusionParams(), unet=unet_cfg,
                      vae=vae_cfg, clip=clip_cfg)
    return model, cfg


def _run(args_list, tiny_setup, monkeypatch, tmp_path):
    model, cfg = tiny_setup
    monkeypatch.setattr(inf, "load_model_config", lambda *a, **k: cfg)
    monkeypatch.setattr(
        inf, "convert_checkpoint",
        lambda *a, **k: (model.unet_params, model.vae_params,
                         model.clip_params))
    monkeypatch.setattr(inf, "load_tokenizer", lambda *a: HashTokenizer())
    prompt_file = tmp_path / "prompts.txt"
    prompt_file.write_text("a red fox\na blue bird\na green frog\n")
    savedir = tmp_path / "out"
    args = inf.build_parser().parse_args([
        "--ckpt_path", "/nonexistent.ckpt",
        "--prompt_file", str(prompt_file),
        "--savedir", str(savedir),
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--frames", str(F), "--ddim_steps", str(F),
    ] + args_list)
    inf.main(args)
    return savedir


def test_inference_writes_one_mp4_per_prompt(tiny_setup, monkeypatch,
                                             tmp_path):
    savedir = _run([], tiny_setup, monkeypatch, tmp_path)
    vids = sorted(os.listdir(savedir))
    assert vids == ["a blue bird.mp4", "a green frog.mp4", "a red fox.mp4"]
    assert all((savedir / v).stat().st_size > 0 for v in vids)


def test_inference_contiguous_prompt_sharding(tiny_setup, monkeypatch,
                                              tmp_path):
    """rank 1 of 2 gets the SECOND contiguous chunk (inference.py:71-77 —
    unlike videocrafter_main's strided rank::num_processes split)."""
    savedir = _run(["--num_processes", "2", "--rank", "1"],
                   tiny_setup, monkeypatch, tmp_path)
    assert sorted(os.listdir(savedir)) == ["a green frog.mp4"]


def test_inference_bs_batched_rounds(tiny_setup, monkeypatch, tmp_path):
    """--bs 2 (inference.py:30,92-101): prompts ride batched sampling
    rounds — 3 prompts → rounds of 2 + 1, one mp4 per prompt either way."""
    savedir = _run(["--bs", "2"], tiny_setup, monkeypatch, tmp_path)
    vids = sorted(os.listdir(savedir))
    assert vids == ["a blue bird.mp4", "a green frog.mp4", "a red fox.mp4"]
    assert all((savedir / v).stat().st_size > 0 for v in vids)


def test_inference_bs_mesh_e2e(tiny_setup, monkeypatch, tmp_path):
    """--bs 4 --mesh 1,8: the batched round's 2·B=8 CFG rows shard over the
    8 virtual devices through the CLI's own flag parsing + pipeline wiring
    (4 prompts → one full batch, one mp4 per prompt)."""
    prompt_file = tmp_path / "p4.txt"
    prompt_file.write_text("a red fox\na blue bird\na green frog\na tan owl\n")
    savedir = _run(["--bs", "4", "--mesh", "1,8",
                    "--prompt_file", str(prompt_file)],
                   tiny_setup, monkeypatch, tmp_path)
    vids = sorted(os.listdir(savedir))
    assert vids == ["a blue bird.mp4", "a green frog.mp4", "a red fox.mp4",
                    "a tan owl.mp4"]
    assert all((savedir / v).stat().st_size > 0 for v in vids)


def test_inference_n_samples_grid(tiny_setup, monkeypatch, tmp_path):
    """n_samples ride ONE mp4 per prompt, laid out side by side with the
    reference's make_grid geometry — padding=2 border all around, so
    W = n·(w+2)+2, H = h+4 (funcs.py:600-612)."""
    import cv2

    savedir = _run(["--n_samples", "2", "--num_processes", "3"],
                   tiny_setup, monkeypatch, tmp_path)
    assert sorted(os.listdir(savedir)) == ["a red fox.mp4"]
    cap = cv2.VideoCapture(str(savedir / "a red fox.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 2 * (WIDTH + 2) + 2
    assert int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT)) == HEIGHT + 4
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == F
    cap.release()


def test_save_video_grid_layout(tmp_path):
    """Pixel-exact make_grid replica: 127-gray border (pad value 0 in
    [-1,1] space), samples in one row, uint8 truncation."""
    from moca_tpu.io.video import save_video_grid
    import cv2

    a = [np.full((4, 6, 3), -1.0, np.float32)]   # black sample
    b = [np.full((4, 6, 3), 1.0, np.float32)]    # white sample
    p = tmp_path / "grid.gif"                    # gif = lossless palette
    save_video_grid([a, b], str(p), fps=5)
    import imageio
    frame = np.asarray(imageio.mimread(str(p))[0])[..., :3]
    assert frame.shape == (4 + 4, 2 * (6 + 2) + 2, 3)
    assert (frame[0] == 127).all()               # border row
    assert (frame[2:6, 2:8] == 0).all()          # sample 0 (black)
    assert (frame[2:6, 10:16] == 255).all()      # sample 1 (white)


def test_step_timer_summary(monkeypatch):
    from moca_tpu.utils.profiling import StepTimer

    t = StepTimer(enabled=True)
    with t.stage("denoise"):
        pass
    with t.stage("denoise"):
        pass
    with t.stage("decode"):
        pass
    s = t.summary()
    assert s["denoise"]["count"] == 2
    assert s["decode"]["count"] == 1
    assert s["denoise"]["total_s"] >= 0.0
    # disabled timer records nothing
    t2 = StepTimer(enabled=False)
    with t2.stage("x"):
        pass
    assert t2.summary() == {}


def test_get_logger_singleton_and_silence():
    from moca_tpu.utils.logging import get_logger

    a = get_logger("moca_tpu.test")
    b = get_logger("moca_tpu.test")
    assert a is b
    a.info("hot loop stays silent by default")  # must not raise
