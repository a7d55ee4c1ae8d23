"""scripts/acceptance.py — the one-command real-weights certification —
driven end to end with SYNTHETIC fixtures (shrunk torch checkpoint + tiny
BPE table), because the real model.ckpt / 16e6 vocab are not in this image.
What a weights-holder runs on a v5e is exactly this command with the real
paths (see the script docstring / README)."""

import gzip
import json

import numpy as np
import pytest
import torch

from tests.oracle import load_reference, randomize_module
from tests.torch_openclip import TextTower
from tests.test_checkpoint_e2e import (
    CLIP_KW, DDCONFIG, TINY_YAML, UNET_KW,
)


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    """ckpt + yaml + bpe on disk, once for the module."""
    d = tmp_path_factory.mktemp("acceptance")
    ref = load_reference()
    unet = randomize_module(ref.openaimodel3d.UNetModel(**UNET_KW), seed=80)
    vae = randomize_module(ref.autoencoder.AutoencoderKL(
        ddconfig=DDCONFIG, lossconfig={"target": "torch.nn.Identity"},
        embed_dim=4), seed=81, scale=0.05)
    clip = randomize_module(TextTower(**CLIP_KW), seed=82)
    sd = {}
    sd.update({f"model.diffusion_model.{k}": v
               for k, v in unet.state_dict().items()})
    sd.update({f"first_stage_model.{k}": v
               for k, v in vae.state_dict().items()})
    sd.update({f"cond_stage_model.model.{k}": v
               for k, v in clip.state_dict().items()})
    torch.save({"state_dict": sd}, d / "model.ckpt")
    (d / "config.yaml").write_text(TINY_YAML)
    with gzip.open(d / "bpe.txt.gz", "wt", encoding="utf-8") as f:
        f.write("version\nc a\nca t</w>\nd o\ndo g</w>\n")
    return d


def _run(fixture_dir, tmp_path, extra):
    from scripts.acceptance import main

    out = tmp_path / "verdict.json"
    art = tmp_path / "artifacts"
    code = main([
        "--ckpt", str(fixture_dir / "model.ckpt"),
        "--bpe", str(fixture_dir / "bpe.txt.gz"),
        "--config", str(fixture_dir / "config.yaml"),
        "--out", str(out), "--artifacts", str(art),
        "--height", "32", "--width", "32", "--video_length", "4",
        "--num_partitions", "2", "--new_video_length", "4",
        "--guidance_scale", "7.5", "--skip_oracles",
    ] + extra)
    return code, json.loads(out.read_text()), art


@pytest.fixture(scope="module")
def first_run(fixture_dir, tmp_path_factory):
    """The no-reference acceptance run, shared by every test below."""
    return _run(fixture_dir, tmp_path_factory.mktemp("run1"), [])


def test_acceptance_end_to_end(first_run):
    """convert → tokenizer → golden clip all pass; ssim records the
    missing-reference instruction instead of failing."""
    code, report, art = first_run
    assert report["stages"]["convert"]["ok"] is True
    assert report["stages"]["convert"]["unet_params"] > 0
    assert report["stages"]["tokenizer"]["ok"] is True
    assert report["stages"]["tokenizer"]["known_answer_checked"] is False
    assert report["stages"]["oracles"]["skipped"] == "--skip_oracles"
    assert report["stages"]["golden"]["ok"] is True
    # the export mirrors the reference CLI's tail slice: the LAST
    # new_video_length//2 frames (videocrafter_main.py:230)
    assert report["stages"]["golden"]["frames"] == 2
    assert "inactive" in report["stages"]["golden"]["injection"]
    assert report["stages"]["ssim"]["ok"] is None
    assert "reference" in report["stages"]["ssim"]["skipped"]
    assert report["ok"] is True and code == 0
    assert (art / "golden_frames.npz").exists()
    assert (art / "golden.mp4").exists()


def test_acceptance_ssim_gate(fixture_dir, first_run, tmp_path):
    """A reference identical to our golden clip passes the 0.98 gate; a
    corrupted reference fails it (and the exit code says so)."""
    code, report, art = first_run
    assert code == 0

    ref_npz = tmp_path / "ref.npz"
    frames = np.load(art / "golden_frames.npz")["frames"]
    np.savez(ref_npz, frames=frames)
    code2, report2, _ = _run(fixture_dir, tmp_path,
                             ["--reference_frames", str(ref_npz)])
    s = report2["stages"]["ssim"]
    assert s["ok"] is True and s["ssim_per_frame_min"] >= 0.98
    assert code2 == 0 and report2["ok"] is True

    bad = tmp_path / "bad.npz"
    np.savez(bad, frames=-frames)  # inverted video: SSIM far below gate
    code3, report3, _ = _run(fixture_dir, tmp_path,
                             ["--reference_frames", str(bad)])
    s3 = report3["stages"]["ssim"]
    assert s3["ok"] is False and s3["ssim_per_frame_min"] < 0.98
    assert code3 == 1 and report3["ok"] is False


def test_acceptance_masks_injection_semantics(fixture_dir, first_run,
                                              tmp_path):
    """--masks routes reference-exported detector masks through
    PrecomputedMaskProvider. Faithful to the reference (x_prev is computed
    BEFORE injection, ddim.py:562 vs :565-609, and funcs.py decodes queue
    latents), the emitted frames must be BIT-IDENTICAL with or without
    masks — that's what makes the SSIM gate valid for mask-driven
    reference runs. --inject_into_queue (our documented fixed mode) must
    actually change them."""
    code, report, art = first_run
    assert code == 0
    masks_npz = tmp_path / "masks.npz"
    np.savez(masks_npz, masks=np.ones((3, 4, 4), np.float32))  # h=w=32/8
    code2, report2, art2 = _run(fixture_dir, tmp_path,
                                ["--masks", str(masks_npz)])
    g = report2["stages"]["golden"]
    assert code2 == 0 and g["ok"] is True
    assert g["injection"].startswith("precomputed masks")
    base = np.load(art / "golden_frames.npz")["frames"]
    faithful = np.load(art2 / "golden_frames.npz")["frames"]
    assert np.array_equal(base, faithful), (
        "reference-faithful injection leaked into the emitted frames")

    code3, report3, art3 = _run(
        fixture_dir, tmp_path,
        ["--masks", str(masks_npz), "--inject_into_queue"])
    assert code3 == 0 and report3["stages"]["golden"]["ok"] is True
    fixed = np.load(art3 / "golden_frames.npz")["frames"]
    assert not np.allclose(base, fixed), (
        "--inject_into_queue changed nothing — injection did not fire")


def test_acceptance_png_reference_roundtrip(fixture_dir, first_run,
                                           tmp_path):
    """--reference_frames also accepts a directory of PNGs (the natural
    CUDA-side export); uint8 round-trip keeps SSIM above the gate."""
    code, report, art = first_run
    assert code == 0
    pngs = list(art.glob("frame_*.png"))
    assert len(pngs) == 2
    code2, report2, _ = _run(fixture_dir, tmp_path,
                             ["--reference_frames", str(art)])
    s = report2["stages"]["ssim"]
    assert s["compared_frames"] == 2
    assert s["ok"] is True, s
