"""IO loaders: DAVIS directory layout, prompts CSV, conditioning image."""

import csv
import os

import numpy as np
import pytest
from PIL import Image

from moca_tpu.io.davis import get_davis_prompt, load_davis_data
from moca_tpu.io.prompts import load_prompts
from moca_tpu.io.video import load_conditioning_image


@pytest.fixture
def davis_root(tmp_path):
    frames = tmp_path / "JPEGImages" / "480p" / "bear"
    masks = tmp_path / "Annotations" / "480p" / "bear"
    frames.mkdir(parents=True)
    masks.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), np.uint8), "RGB"
        ).save(frames / f"{i:05d}.jpg")
        m = np.zeros((48, 64), np.uint8)
        m[10:30, 20:40] = 255
        Image.fromarray(m, "L").save(masks / f"{i:05d}.png")
    return str(tmp_path)


def test_load_davis_data(davis_root):
    frames, masks = load_davis_data("bear", davis_root, video_size=(4, 8),
                                    video_frames=4)
    # frames at 8× latent res, [-1,1]; masks binary at latent res
    assert frames.shape == (4, 32, 64, 3)
    # 1-ulp overshoot allowed: (x/255-0.5)*2 rounds 255 → 1.0000001, same
    # as the reference's torch formula (funcs.py:565)
    assert frames.min() >= -1.0 - 1e-6 and frames.max() <= 1.0 + 1e-6
    assert masks.shape == (4, 4, 8)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    assert masks.sum() > 0


def test_load_davis_uniform_sampling(davis_root):
    frames, _ = load_davis_data("bear", davis_root, video_size=(4, 8),
                                video_frames=3,
                                sampling_strategy="uniform")
    assert frames.shape[0] == 3


def test_davis_prompt_fallback(tmp_path):
    assert get_davis_prompt("bear", str(tmp_path / "none.txt")) == "object bear"
    ann = tmp_path / "ann.txt"
    ann.write_text('bear 1 "a bear walking"\n')
    assert get_davis_prompt("bear", str(ann)) == "object a bear walking"


def test_load_prompts_real_csv():
    rows = load_prompts("prompts/prompts.csv")
    assert len(rows) >= 1
    r = rows[0]
    assert r["conditioned_prompt"].endswith(".")
    assert isinstance(r["gamma"], float)
    # prompt_index selection (funcs.py:511-522)
    one = load_prompts("prompts/prompts.csv", prompt_index=1)
    assert len(one) == 1 and one[0]["prompt"] == rows[1]["prompt"]
    with pytest.raises(ValueError):
        load_prompts("prompts/prompts.csv", prompt_index=10_000)


def test_load_conditioning_image(tmp_path):
    p = tmp_path / "cond.png"
    raw = np.random.default_rng(0).integers(0, 255, (100, 80, 3), np.uint8)
    Image.fromarray(raw).save(p)
    img = load_conditioning_image(str(p), (40, 64))
    # latent-res RGBA in [0,1] (videocrafter_main.py:90-98 ToTensor range)
    assert img.shape == (40, 64, 4)
    assert img.min() >= 0.0 and img.max() <= 1.0
    # exact chain: transforms.Resize((h,w)) with a TUPLE squashes to (h,w)
    # — no aspect crop — and on PIL input it IS PIL's bilinear resize;
    # CenterCrop((h,w)) is then a no-op (videocrafter_main.py:90-94)
    want = np.asarray(
        Image.open(p).convert("RGBA").resize((64, 40), Image.BILINEAR),
        np.float32) / 255.0
    np.testing.assert_array_equal(img, want)


def test_load_conditioning_image_squashes_not_crops(tmp_path):
    """A wide image's edge columns must SURVIVE (the reference squashes;
    an aspect-preserving resize+crop would drop them)."""
    p = tmp_path / "wide.png"
    wide = np.zeros((10, 100, 3), np.uint8)
    wide[:, :5] = 255  # bright left edge far outside any center crop
    Image.fromarray(wide).save(p)
    img = load_conditioning_image(str(p), (8, 16))
    assert img[:, 0, :3].mean() > 0.5, "left edge was cropped away"


def test_load_image_batch_reference_chain(tmp_path):
    """load_image_batch must follow funcs.py:586-595 exactly: RGBA kept,
    float32 BEFORE the cv2.INTER_LINEAR resize to (H, W), normalization to
    [-1, 1] AFTER."""
    import cv2
    from moca_tpu.io.video import load_image_batch

    rng = np.random.default_rng(0)
    raw = rng.integers(0, 256, (7, 5, 4), np.uint8)
    p = os.path.join(tmp_path, "img.png")
    Image.fromarray(raw, mode="RGBA").save(p)

    out = load_image_batch([p], image_size=(12, 9))  # (H, W)
    assert out.shape == (1, 12, 9, 4)
    # verbatim reference chain
    want = np.asarray(Image.open(p).convert("RGBA"), np.float32)
    want = cv2.resize(want, (9, 12), interpolation=cv2.INTER_LINEAR)
    want = (want / 255.0 - 0.5) * 2.0
    np.testing.assert_array_equal(out[0], want)
    assert out.min() >= -1.0 and out.max() <= 1.0

    with pytest.raises(NotImplementedError):
        load_image_batch([os.path.join(tmp_path, "x.bmp")])


def test_load_image_batch_mp4_first_frame(tmp_path):
    """The mp4 branch returns the FIRST frame at the requested size
    (funcs.py:582-584)."""
    import cv2
    from moca_tpu.io.video import load_image_batch, save_video

    frames = [np.full((16, 16, 3), v, np.float32) for v in (-0.5, 0.5)]
    p = os.path.join(tmp_path, "v.mp4")
    save_video(frames, p, fps=5)
    out = load_image_batch([p], image_size=(8, 8))
    assert out.shape == (1, 8, 8, 3)
    # first frame is the dark one (codec-lossy, so approximate)
    assert abs(out[0].mean() - (-0.5)) < 0.1


def test_load_davis_frames_reference_chain(davis_root):
    """Frame resampling must be the reference's exact chain
    (funcs.py:694-706): RGBA uint8 → cv2.INTER_LANCZOS4 → RGB slice →
    (x/255 − 0.5)·2. cv2's Lanczos is sample-based (no antialias
    prefilter), so PIL-Lanczos output would differ."""
    import cv2
    frames, _ = load_davis_data("bear", davis_root, video_size=(4, 8),
                                video_frames=2)
    fdir = os.path.join(davis_root, "JPEGImages", "480p", "bear")
    f0 = sorted(os.listdir(fdir))[0]
    raw = np.asarray(Image.open(os.path.join(fdir, f0)).convert("RGBA"),
                     np.uint8)
    want = cv2.resize(raw, (64, 32), interpolation=cv2.INTER_LANCZOS4)
    want = (want[..., :3].astype(np.float32) / 255.0 - 0.5) * 2.0
    np.testing.assert_allclose(frames[0], want, atol=1e-6)
