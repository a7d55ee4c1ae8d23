"""Host-side segmentation-mask providers for open-vocabulary injection.

The reference runs Grounding-DINO + SAM2 *inside* the denoise loop with a
GPU→PIL→GPU round trip per frame (ref: lvdm/models/samplers/ddim.py:739-903)
— the single biggest perf sin to avoid on TPU (SURVEY §7). Here mask
acquisition is a host-side provider that runs OUTSIDE the jitted FIFO step;
the step consumes a queue-aligned mask tensor.

Providers:
  * PrecomputedMaskProvider — masks from disk / DAVIS (the reference's
    first-class path).
  * CallbackMaskProvider — wraps any `fn(frame_uint8, target_text) -> mask`
    (e.g. an external detector served on CPU); applies the reference's
    temporal-consistency gates: reuse the previous mask when detection is
    empty (ddim.py:788-793), when IoU(new, prev) < 0.5 (ddim.py:803-807),
    and skip masks covering > 80 % of the frame (ddim.py:819-821).
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np


def latent_to_uint8_frame(latent_hwc: np.ndarray) -> np.ndarray:
    """The reference's latent→uint8 'image' conversion fed to the detector
    (ddim.py:744-763): take the first 3 channels of the [h, w, C] latent and
    cast — scaling by 255 only when the max is ≤ 1 (reproduced exactly,
    including the direct uint8 cast of out-of-range floats otherwise)."""
    frame = np.asarray(latent_hwc, np.float32)
    if frame.shape[-1] != 3:
        if frame.shape[-1] == 1:
            frame = np.repeat(frame, 3, axis=-1)
        else:
            frame = frame[:, :, :3]
    if np.floor(frame.max()) <= 1.0:
        return (frame * 255).astype(np.uint8)
    return frame.astype(np.uint8)


def mask_iou(a: np.ndarray, b: np.ndarray) -> float:
    """Mean IoU of binary masks (ddim.py:905-943; empty∧empty → 1)."""
    a = a > 0.5
    b = b > 0.5
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    if union == 0:
        return 1.0 if inter == 0 else 0.0
    return float(inter) / float(union)


class PrecomputedMaskProvider:
    """Serve masks from a [T, h, w] array, looping the last frame."""

    def __init__(self, masks: np.ndarray):
        self.masks = np.asarray(masks, np.float32)

    def __call__(self, frame_index: int, frame=None, target=None) -> np.ndarray:
        idx = min(frame_index, self.masks.shape[0] - 1)
        return self.masks[idx]


class CallbackMaskProvider:
    """Open-vocab provider with the reference's temporal-consistency gates."""

    def __init__(self, segment_fn: Callable[[np.ndarray, str], Optional[np.ndarray]],
                 iou_threshold: float = 0.5, coverage_max: float = 0.8):
        self.segment_fn = segment_fn
        self.iou_threshold = iou_threshold
        self.coverage_max = coverage_max
        self.prev_mask: Optional[np.ndarray] = None

    def __call__(self, frame_index: int, frame: np.ndarray,
                 target: str) -> Optional[np.ndarray]:
        if not target.endswith("."):
            target = target + "."  # ddim.py:741-742
        mask = self.segment_fn(frame, target)
        if mask is None:
            mask = self.prev_mask  # empty detection → previous (ddim.py:788-793)
        elif self.prev_mask is not None and \
                mask_iou(mask, self.prev_mask) < self.iou_threshold:
            mask = self.prev_mask  # drift gate (ddim.py:803-807)
        # the coverage gate skips the INJECTION only — the oversized mask
        # still becomes pre_masks for the next frame (ddim.py:819-821 skips
        # the paste; :606 carries the returned masks regardless)
        self.prev_mask = mask
        if mask is not None and mask.mean() > self.coverage_max:
            return None
        return mask
