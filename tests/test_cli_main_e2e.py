"""videocrafter_main-parity CLI e2e (ref: videocrafter_main.py:66-232):
drive `cli.main.main` through both modes with a tiny injected pipeline —
prompt-CSV mode (output-dir layout, per-frame PNG dump, latent cache) and
DAVIS mode (real-video + GT masks)."""

from __future__ import annotations

import os

import numpy as np
import pytest
from PIL import Image

import jax

import moca_tpu.cli.main as cli_main
from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline

HEIGHT = WIDTH = 32
F, N, L = 4, 2, 2


@pytest.fixture(scope="module")
def tiny_pipe():
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
    return MoCAVideoPipeline(
        model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=L, guidance_scale=7.5)


def _base_args(extra):
    return cli_main.build_parser().parse_args([
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--video_length", str(F), "-n", str(N), "-l", str(L),
    ] + extra)


def test_cli_main_prompt_mode(tiny_pipe, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)  # latents land under cwd/results/...
    monkeypatch.setattr(cli_main, "load_pipeline", lambda a: tiny_pipe)
    cond = tmp_path / "cat.png"
    Image.fromarray(np.full((16, 16, 4), 128, np.uint8), "RGBA").save(cond)
    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "prompt,conditioned_object,conditioned_image_path,"
        "conditioned_prompt,gamma\n"
        f"a red fox,cat,{cond},a cat,0.4\n")
    out_root = tmp_path / "out"
    args = _base_args(["--prompt_file", str(csv),
                       "--output_dir", str(out_root),
                       "--save_visualizations"])
    cli_main.main(args)

    # output layout: {output_dir}/{image stem}/{prompt[:100]}.mp4
    vid = out_root / "cat" / "a red fox.mp4"
    assert vid.exists() and vid.stat().st_size > 0
    # --save_frames default-on: streaming per-frame PNGs (funcs.py:362-365)
    fifo_dir = out_root / "cat" / "fifo"
    assert sorted(os.listdir(fifo_dir))[0] == "0.png"
    # --save_visualizations: the reference's inline artifact set, host-side
    viz = out_root / "cat" / "visualizations"
    assert list((viz / "pred_x0").glob("pred_x0_step_*_frame_*.png"))
    assert list((viz / "masks").glob("cond_image_step_*.png"))
    # latent cache written with the reference's resume contract
    steps = F * N
    lat = (tmp_path / "results" / "moca_tpu" / "latents" / f"{steps}steps"
           / "a red fox" / "eta1.0" / f"{steps}.npz")
    assert lat.exists()


def test_cli_main_odd_length_tail_slice(tiny_pipe, monkeypatch, tmp_path):
    """videocrafter_main.py:230 keeps video_frames[-new_video_length//2:]
    — unary minus INSIDE the floor division, so odd N exports ceil(N/2)
    tail frames (N=3 → 2), not N//2 = 1."""
    import cv2

    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(cli_main, "load_pipeline", lambda a: tiny_pipe)
    # new_video_length only drives the host loop count/slice — same jit
    # shapes, no retrace of the module-scoped pipeline
    monkeypatch.setattr(tiny_pipe, "new_video_length", 3)
    cond = tmp_path / "cat.png"
    Image.fromarray(np.full((16, 16, 4), 128, np.uint8), "RGBA").save(cond)
    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "prompt,conditioned_object,conditioned_image_path,"
        "conditioned_prompt,gamma\n"
        f"a red fox,cat,{cond},a cat,0.4\n")
    out_root = tmp_path / "out"
    args = cli_main.build_parser().parse_args([
        "--height", str(HEIGHT), "--width", str(WIDTH),
        "--video_length", str(F), "-n", str(N), "-l", "3",
        "--prompt_file", str(csv), "--output_dir", str(out_root),
        "--no_save_frames"])
    cli_main.main(args)
    cap = cv2.VideoCapture(str(out_root / "cat" / "a red fox.mp4"))
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 2  # ceil(3/2)
    cap.release()


def test_cli_main_davis_mode(tiny_pipe, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(cli_main, "load_pipeline", lambda a: tiny_pipe)
    # fake DAVIS tree
    frames_dir = tmp_path / "DAVIS" / "JPEGImages" / "480p" / "bear"
    masks_dir = tmp_path / "DAVIS" / "Annotations" / "480p" / "bear"
    frames_dir.mkdir(parents=True)
    masks_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(rng.integers(0, 255, (HEIGHT, WIDTH, 3), np.uint8),
                        "RGB").save(frames_dir / f"{i:05d}.jpg")
        m = np.zeros((HEIGHT, WIDTH), np.uint8)
        m[8:24, 8:24] = 255
        Image.fromarray(m, "L").save(masks_dir / f"{i:05d}.png")
    cond = tmp_path / "concept.png"
    Image.fromarray(np.full((16, 16, 4), 90, np.uint8), "RGBA").save(cond)
    out_root = tmp_path / "dav_out"
    args = _base_args([
        "--use_davis", "--video_name", "bear",
        "--davis_root", str(tmp_path / "DAVIS"),
        "--conditioned_image_path", str(cond),
        "--output_dir", str(out_root), "--no_use_mp4",
    ])
    cli_main.main(args)
    vid = out_root / "concept" / "bear.gif"
    assert vid.exists() and vid.stat().st_size > 0


def test_cli_main_multiprompts(tiny_pipe, monkeypatch, tmp_path):
    """--multiprompts uses the reference's own convention (N prompts + one
    comma-separated length list, funcs.py:375-381) to drive the
    multi-scene stream from the CLI."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(cli_main, "load_pipeline", lambda a: tiny_pipe)
    cond = tmp_path / "cat.png"
    Image.fromarray(np.full((16, 16, 4), 128, np.uint8), "RGBA").save(cond)
    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "prompt,conditioned_object,conditioned_image_path,"
        "conditioned_prompt,gamma\n"
        f"a red fox,cat,{cond},a cat,0.4\n")
    out_root = tmp_path / "out_mp"
    args = _base_args([
        "--prompt_file", str(csv), "--output_dir", str(out_root),
        "--no_save_frames",
        "--multiprompts", "a red fox", "a blue bird", "1,1"])
    cli_main.main(args)
    assert (out_root / "cat" / "a red fox.mp4").exists()


def test_multiprompts_flag_validation():
    args = cli_main.build_parser().parse_args(
        ["--multiprompts", "p1", "p2", "3,4"])
    assert args.multiprompts == ["p1", "p2", "3,4"]


def test_pipeline_full_rerun_determinism(tiny_pipe):
    """Same seed, fresh run (no latent cache) → bit-identical frames: no
    hidden global RNG anywhere in the pipeline (docs/RNG.md contract)."""
    h, w = HEIGHT // 8, WIDTH // 8
    cond = np.full((h, w, 4), 0.2, np.float32)
    runs = []
    for _ in range(2):
        frames = tiny_pipe("a mouse", jax.random.PRNGKey(7),
                           cond_image=cond, conditioned_prompt="a cat",
                           gamma=0.5, height=HEIGHT, width=WIDTH)
        runs.append(np.stack(frames))
    np.testing.assert_array_equal(runs[0], runs[1])
