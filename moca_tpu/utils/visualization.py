"""Debug visualization — strictly host-side, outside jit, off by default.

The reference runs matplotlib quiver plots and PNG dumps INSIDE the denoise
loop (ref: lvdm/models/samplers/ddim.py:399-554,611-641 and
samplers/visualization.py), which both serializes the GPU and — via loop
variable shadowing (ddim.py:477,502,533) — corrupts the algorithm itself.
Here visualization is a sink you attach to the pipeline's frame_callback or
feed explicitly; the jitted step functions never touch it.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def latent_to_image(latent: np.ndarray) -> np.ndarray:
    """[h, w, C] latent → uint8 RGB preview (first 3 channels, ±1 scaling —
    same framing as ddim.py:744-763 uses for its SAM input)."""
    x = np.asarray(latent, np.float32)
    if x.shape[-1] == 1:
        x = np.repeat(x, 3, axis=-1)
    x = x[..., :3]
    return ((x + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


class VisualizationSink:
    """Writes latent/mask/frame previews under a directory tree mirroring
    the reference's visualizations/{pred_x0,masks,conditioning} layout."""

    def __init__(self, root: str = "visualizations", enabled: bool = True):
        self.root = root
        self.enabled = enabled

    def _save(self, sub: str, name: str, img: np.ndarray):
        if not self.enabled:
            return
        from PIL import Image

        d = os.path.join(self.root, sub)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(img).save(os.path.join(d, name))

    def pred_x0(self, step: int, frame_idx: int, latent: np.ndarray):
        self._save("pred_x0", f"pred_x0_step_{step}_frame_{frame_idx}.png",
                   latent_to_image(latent))

    def mask(self, step: int, mask: np.ndarray):
        m = (np.asarray(mask, np.float32) * 255).clip(0, 255).astype(np.uint8)
        self._save("masks", f"mask_step_{step}.png", m)

    def conditioning(self, step: int, cond: np.ndarray):
        self._save("conditioning", f"cond_image_step_{step}.png",
                   latent_to_image(cond))

    def frame(self, index: int, frame_uint8: np.ndarray):
        self._save("fifo", f"{index}.png", frame_uint8)
