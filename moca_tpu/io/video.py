"""Host-side video/image IO (outside jit, CPU only).

Replaces the reference's decord/torchvision/imageio stack
(ref: scripts/evaluation/funcs.py:538-640) with imageio/PIL; the uint8↔float
conversions go through the optional C++ fastio extension (native/) when
built, else numpy.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

try:
    from moca_tpu.io import fastio as _fastio
    _HAVE_FASTIO = _fastio.available()
except Exception:  # pragma: no cover
    _fastio = None
    _HAVE_FASTIO = False


def tensor_to_uint8(frame: np.ndarray) -> np.ndarray:
    """[-1,1] float [H,W,3] → uint8 (funcs.py:630-640 tensor2image)."""
    if _HAVE_FASTIO:
        return _fastio.float_to_uint8(np.ascontiguousarray(frame, np.float32))
    x = np.clip(frame.astype(np.float32), -1.0, 1.0)
    return ((x + 1.0) * 127.5).astype(np.uint8)


def uint8_to_tensor(img: np.ndarray) -> np.ndarray:
    """uint8 → [-1,1] float32 (funcs.py:565)."""
    if _HAVE_FASTIO:
        return _fastio.uint8_to_float(np.ascontiguousarray(img, np.uint8))
    return (img.astype(np.float32) / 255.0 - 0.5) * 2.0


def stack_frames(frames: Sequence[np.ndarray]) -> np.ndarray:
    """Equally-shaped frames → one contiguous [T, ...] clip buffer
    (multithreaded native pack when built, else np.stack)."""
    if (_HAVE_FASTIO and len(frames) > 1
            and all(f.dtype == np.uint8 for f in frames)):
        return _fastio.pack_frames(frames)
    return np.stack(frames)


def save_video(frames: Sequence[np.ndarray], path: str, fps: int = 10):
    """frames: list of [-1,1] float or uint8 [H,W,3] → mp4/gif by extension.

    mp4 uses cv2.VideoWriter (this image ships no imageio-ffmpeg backend);
    gif uses imageio/Pillow.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    imgs = stack_frames(
        [f if f.dtype == np.uint8 else tensor_to_uint8(f) for f in frames])
    if path.endswith(".gif"):
        import imageio

        imageio.mimsave(path, list(imgs), duration=int(1000 / fps))
        return
    import cv2

    h, w = imgs[0].shape[:2]
    writer = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not writer.isOpened():
        raise RuntimeError(f"cv2.VideoWriter could not open {path}")
    for img in imgs:
        writer.write(cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    writer.release()


def save_gif(frames: Sequence[np.ndarray], path: str, fps: int = 10):
    save_video(frames, path if path.endswith(".gif") else path + ".gif", fps)


def save_video_grid(sample_videos: Sequence[Sequence[np.ndarray]],
                    path: str, fps: int = 10, padding: int = 2):
    """ONE video per prompt with the n_samples laid out side by side — the
    reference's save_videos output layout (funcs.py:600-612:
    torchvision.utils.make_grid(framesheet, nrow=n_samples) per time step,
    default padding=2, pad value 0 in [-1,1] space → a 127-gray border,
    also present around single-sample outputs).

    sample_videos: n_samples sequences of [H, W, 3] float frames in [-1,1].
    """
    n = len(sample_videos)
    t_len = len(sample_videos[0])
    h, w, c = np.asarray(sample_videos[0][0]).shape
    frames = []
    for t in range(t_len):
        grid = np.zeros(
            (h + 2 * padding, n * (w + padding) + padding, c), np.float32)
        for i in range(n):
            x0 = padding + i * (w + padding)
            grid[padding:padding + h, x0:x0 + w] = np.clip(
                np.asarray(sample_videos[i][t], np.float32), -1.0, 1.0)
        frames.append(grid)
    save_video(frames, path, fps=fps)


def load_conditioning_image(path: str, latent_hw: Tuple[int, int]) -> np.ndarray:
    """Concept image at LATENT resolution [h, w, 4] RGBA in [0, 1].

    Matches videocrafter_main.py:90-98 exactly: `transforms.Resize((h, w))`
    with a TUPLE squashes to exactly (h, w) — no aspect preservation — and
    the following CenterCrop((h, w)) is a no-op; on PIL input torchvision's
    bilinear Resize is PIL's own Image.BILINEAR. ToTensor keeps the 0..1
    range (NOT normalized to [-1,1]).
    """
    h, w = latent_hw
    img = Image.open(path).convert("RGBA")
    img = img.resize((w, h), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def load_image_batch(paths: Sequence[str],
                     image_size: Tuple[int, int] = (256, 256)) -> np.ndarray:
    """Images (or first frames of mp4s) → [B, H, W, C] float32 in [-1, 1]
    (funcs.py:576-597; png/jpg keep RGBA like the reference's convert, and
    the resize is the reference's exact chain: float32 cv2.INTER_LINEAR on
    the raw 0..255 values, normalized AFTER — funcs.py:587-595)."""
    import cv2

    batch: List[np.ndarray] = []
    for path in paths:
        ext = os.path.splitext(path)[1].lower()
        if ext == ".mp4":
            frame = load_video_frames(path, size=image_size, num_frames=1)[0]
            batch.append(frame)
            continue
        if ext not in (".png", ".jpg", ".jpeg"):
            raise NotImplementedError(
                f"image loading supports mp4/png/jpg, got {ext}")
        rgba = np.asarray(Image.open(path).convert("RGBA"), np.float32)
        rgba = cv2.resize(rgba, (image_size[1], image_size[0]),
                          interpolation=cv2.INTER_LINEAR)
        batch.append((rgba / 255.0 - 0.5) * 2.0)
    return np.stack(batch)


def load_video_frames(path: str, size: Optional[Tuple[int, int]] = None,
                      num_frames: int = -1, stride: int = 1) -> np.ndarray:
    """mp4 → [T, H, W, 3] float32 in [-1,1] (decord replacement,
    funcs.py:538-574; pads by repeating the last frame when short)."""
    import cv2

    cap = cv2.VideoCapture(path)
    if not cap.isOpened():
        raise OSError(f"could not open video {path}")
    frames: List[np.ndarray] = []
    i = -1
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        i += 1
        if i % stride:
            continue
        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
        if size is not None:
            frame = np.asarray(
                Image.fromarray(frame).resize((size[1], size[0]),
                                              Image.BILINEAR))
        frames.append(frame)
        if num_frames > 0 and len(frames) >= num_frames:
            break
    cap.release()
    if num_frames > 0 and len(frames) < num_frames:
        frames += [frames[-1]] * (num_frames - len(frames))
    return uint8_to_tensor(np.stack(frames))
