"""Artifact-set parity for utils/visualization.py against the reference's
VisualizationHelper (lvdm/models/samplers/visualization.py:10-155) and the
inline denoise-loop dumps (ddim.py:611-641, 849-899): same directory layout
and file names, host-side only (the jitted step functions never touch it)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from moca_tpu.utils import visualization as viz


def test_visualize_mask_and_latent_layout(tmp_path):
    mask = (np.arange(64).reshape(8, 8) % 2).astype(np.float32)
    latent = np.random.default_rng(0).normal(size=(8, 8, 4)).astype(np.float32)
    viz.visualize_mask_and_latent(mask, latent, timestep=300, frame_idx=2,
                                  save_dir=str(tmp_path))
    d = tmp_path / "timestep_0300"
    assert (d / "frame_002.png").exists()
    # raw dumps: .npy (divergence from torch .pt, DECISIONS)
    np.testing.assert_array_equal(np.load(d / "mask_002.npy"), mask)
    np.testing.assert_array_equal(np.load(d / "latent_002.npy"), latent)


@pytest.mark.parametrize("manipulated,sub", [
    (False, "step_007_before_manipulation"),
    (True, "step_007_after_manipulation"),
])
def test_visualize_sampling_layout(tmp_path, manipulated, sub):
    rng = np.random.default_rng(1)
    pred = rng.normal(size=(4, 8, 8, 4)).astype(np.float32)  # [T,h,w,C]
    noise = rng.normal(size=(4, 8, 8, 4)).astype(np.float32)
    viz.visualize_sampling(pred, noise, str(tmp_path), step=7,
                           is_manipulated=manipulated)
    f = tmp_path / sub / "frame_000.png"
    assert f.exists()
    from PIL import Image

    img = np.asarray(Image.open(f))
    assert img.shape == (8, 16, 3)  # two 8×8 tiles side by side


def test_visualize_masks_layout(tmp_path):
    masks = np.stack([np.zeros((6, 6)), np.ones((6, 6))]).astype(np.float32)
    viz.visualize_masks(masks, str(tmp_path), step=3)
    d = tmp_path / "step_003_masks"
    assert (d / "mask_000.png").exists() and (d / "mask_001.png").exists()
    from PIL import Image

    assert np.asarray(Image.open(d / "mask_001.png")).max() == 255


def test_visualize_latents_layout(tmp_path):
    lat = np.random.default_rng(2).normal(size=(3, 5, 5, 4)).astype(np.float32)
    viz.visualize_latents(lat, str(tmp_path))
    d = tmp_path / "latents"
    assert sorted(os.listdir(d)) == [
        "frame_000.png", "frame_001.png", "frame_002.png"]


def test_visualize_object_attention_layout(tmp_path):
    rng = np.random.default_rng(3)
    pred = rng.normal(size=(8, 8, 3)).astype(np.float32)
    cond = rng.normal(size=(8, 8, 3)).astype(np.float32)
    amask = (rng.uniform(size=(8, 8)) > 0.5).astype(np.float32)
    amap = rng.uniform(size=(8, 8)).astype(np.float32)
    labels = (rng.uniform(size=(8, 8)) * 4).astype(np.int32)
    viz.visualize_object_attention(pred, cond, amask, amap, labels,
                                   "cat", str(tmp_path), step=5)
    assert (tmp_path / "step_005_object_attention"
            / "object_attention_cat.png").exists()


def test_sink_moca_step_artifacts(tmp_path):
    """moca_step mirrors the inline loop dumps: pred_x0 PNGs named by
    schedule timestep, mask/cond PNGs in the masks dir (ddim.py:612,861,
    894-899 — the reference writes the cond preview into the masks dir)."""
    sink = viz.VisualizationSink(str(tmp_path))
    rng = np.random.default_rng(4)
    pred = rng.normal(size=(2, 6, 6, 4)).astype(np.float32)
    mask = (rng.uniform(size=(6, 6, 1)) > 0.5).astype(np.float32)
    cond = rng.normal(size=(6, 6, 4)).astype(np.float32)
    sink.moca_step(9, pred, timesteps=[21, 81], mask=mask, cond=cond)
    assert (tmp_path / "pred_x0" / "pred_x0_step_21_frame_0.png").exists()
    assert (tmp_path / "pred_x0" / "pred_x0_step_81_frame_1.png").exists()
    assert (tmp_path / "masks" / "mask_step_9.png").exists()
    assert (tmp_path / "masks" / "cond_image_step_9.png").exists()


def test_sink_disabled_writes_nothing(tmp_path):
    sink = viz.VisualizationSink(str(tmp_path / "x"), enabled=False)
    sink.moca_step(0, np.zeros((1, 4, 4, 4), np.float32), [5],
                   mask=np.zeros((4, 4, 1), np.float32))
    assert not (tmp_path / "x").exists()
