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

    # --- per-iteration MoCA dump (the reference's inline artifact set,
    # ddim.py:611-641 pred_x0 PNGs and :849-899 mask/cond PNGs, emitted
    # from inside the denoise loop there; here from the host loop) ---
    def moca_step(self, step: int, pred_x0_slots: np.ndarray,
                  timesteps, mask: Optional[np.ndarray] = None,
                  cond: Optional[np.ndarray] = None):
        """pred_x0_slots: [k, h, w, C] pre-injection predictions for the
        low-t queue slots; timesteps: their schedule t values."""
        for j, t in enumerate(timesteps):
            self.pred_x0(int(t), j, pred_x0_slots[j])
        if mask is not None:
            m = np.asarray(mask, np.float32)
            self._save("masks", f"mask_step_{step}.png",
                       (m.reshape(m.shape[-3:-1]) * 255)
                       .clip(0, 255).astype(np.uint8))
        if cond is not None:
            # the reference writes the cond preview into the masks dir
            # (ddim.py:894-899)
            self._save("masks", f"cond_image_step_{step}.png",
                       latent_to_image(np.asarray(cond)))


def _normalize01(x: np.ndarray) -> np.ndarray:
    x = np.asarray(x, np.float32)
    lo, hi = x.min(), x.max()
    return (x - lo) / (hi - lo) if hi > lo else np.zeros_like(x)


def _rgb3(x: np.ndarray) -> np.ndarray:
    """[h, w, C] → [h, w, 3] (repeat 1-channel, truncate/pad otherwise —
    the channel dance of visualization.py:622-632 in channels-last)."""
    if x.ndim == 2:
        x = x[..., None]
    c = x.shape[-1]
    if c == 1:
        return np.repeat(x, 3, axis=-1)
    if c >= 3:
        return x[..., :3]
    return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, 3 - c)])


# ---------------------------------------------------------------------------
# VisualizationHelper parity (ref: lvdm/models/samplers/visualization.py:10-155)
# All functions take channels-last arrays ([h,w,C] frames, [T,h,w,C] clips,
# [h,w] masks) and write the reference's exact directory/file layout. Raw
# tensor dumps use .npy instead of torch .pt (documented divergence — no
# torch dependency on the host viz path).
# ---------------------------------------------------------------------------

def visualize_mask_and_latent(mask: np.ndarray, latent: np.ndarray,
                              timestep: int, frame_idx: int, save_dir: str):
    """Side-by-side mask heatmap + latent preview per denoise timestep
    (visualization.py:12-45): timestep_{t:04d}/frame_{f:03d}.png plus raw
    mask_{f:03d}.npy / latent_{f:03d}.npy dumps."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    step_dir = os.path.join(save_dir, f"timestep_{int(timestep):04d}")
    os.makedirs(step_dir, exist_ok=True)
    mask2d = np.asarray(mask, np.float32)
    mask2d = mask2d.reshape(mask2d.shape[-2:] if mask2d.ndim == 2
                            else mask2d.shape[-3:-1])
    latent_vis = _normalize01(_rgb3(np.asarray(latent, np.float32)))

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 6))
    im = ax1.imshow(mask2d, cmap="hot")
    ax1.set_title(f"Mask (Frame {frame_idx})")
    fig.colorbar(im, ax=ax1)
    ax2.imshow(latent_vis)
    ax2.set_title(f"Latent (Frame {frame_idx})")
    fig.tight_layout()
    fig.savefig(os.path.join(step_dir, f"frame_{frame_idx:03d}.png"))
    plt.close(fig)
    np.save(os.path.join(step_dir, f"mask_{frame_idx:03d}.npy"),
            np.asarray(mask))
    np.save(os.path.join(step_dir, f"latent_{frame_idx:03d}.npy"),
            np.asarray(latent))


def visualize_sampling(pred_x0: np.ndarray, noise: np.ndarray, save_dir: str,
                       step: int, is_manipulated: bool = False):
    """Two-up first-frame strip, pred_x0 beside its noise counterpart
    (visualization.py:47-74): step_{s:03d}_{before|after}_manipulation/
    frame_000.png, each tile min-max normalized."""
    from PIL import Image

    status = "after_manipulation" if is_manipulated else "before_manipulation"
    step_dir = os.path.join(save_dir, f"step_{step:03d}_{status}")
    os.makedirs(step_dir, exist_ok=True)

    def tile(x):
        x = np.asarray(x, np.float32)
        if x.ndim == 4:  # [T,h,w,C] → first frame
            x = x[0]
        return (_normalize01(_rgb3(x)) * 255).astype(np.uint8)

    grid = np.concatenate([tile(pred_x0), tile(noise)], axis=1)  # nrow=2
    Image.fromarray(grid).save(os.path.join(step_dir, "frame_000.png"))


def visualize_masks(masks, save_dir: str, step: int):
    """Per-mask PNG dump (visualization.py:121-137):
    step_{s:03d}_masks/mask_{i:03d}.png."""
    from PIL import Image

    masks_dir = os.path.join(save_dir, f"step_{step:03d}_masks")
    os.makedirs(masks_dir, exist_ok=True)
    for i, m in enumerate(np.asarray(masks, np.float32)):
        img = (m.reshape(m.shape[:2]) * 255).clip(0, 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(masks_dir, f"mask_{i:03d}.png"))


def visualize_latents(latents: np.ndarray, save_dir: str):
    """Per-frame latent previews (visualization.py:139-155):
    latents/frame_{i:03d}.png. Divergence: the reference min-max normalizes
    to [0,1] then re-applies (x+1)/2 (:146,153), washing every preview
    toward white; here a single min-max normalize (DECISIONS.md)."""
    from PIL import Image

    latents_dir = os.path.join(save_dir, "latents")
    os.makedirs(latents_dir, exist_ok=True)
    x = _normalize01(np.asarray(latents, np.float32))
    for i, frame in enumerate(x):
        img = (_rgb3(frame) * 255).astype(np.uint8)
        Image.fromarray(img).save(
            os.path.join(latents_dir, f"frame_{i:03d}.png"))


def visualize_object_attention(pred_image: np.ndarray, cond_image: np.ndarray,
                               attention_mask: np.ndarray,
                               attention_map: np.ndarray,
                               labeled_regions, target_object,
                               save_dir: str, step: int):
    """2×3 attention-debug panel (visualization.py:76-119):
    step_{s:03d}_object_attention/object_attention_{target}.png."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    step_dir = os.path.join(save_dir, f"step_{step:03d}_object_attention")
    os.makedirs(step_dir, exist_ok=True)
    pred = _rgb3(np.asarray(pred_image, np.float32))
    cond = _rgb3(np.asarray(cond_image, np.float32))
    amask = np.asarray(attention_mask, np.float32)
    amap = np.asarray(attention_map, np.float32)

    fig, axes = plt.subplots(2, 3, figsize=(18, 12))
    axes[0, 0].imshow(_normalize01(pred))
    axes[0, 0].set_title("Generated Image")
    axes[0, 1].imshow(_normalize01(cond))
    axes[0, 1].set_title("Conditioning Image")
    im = axes[0, 2].imshow(amap, cmap="hot")
    axes[0, 2].set_title("Raw Attention Map")
    fig.colorbar(im, ax=axes[0, 2])
    if labeled_regions is not None:
        axes[1, 0].imshow(np.asarray(labeled_regions), cmap="nipy_spectral")
        axes[1, 0].set_title("Connected Components")
    axes[1, 1].imshow(amask, cmap="hot")
    axes[1, 1].set_title(f"Mask for {target_object}" if target_object
                         else "Overall Mask")
    masked = pred.copy()
    masked[amask > 0.5] = cond[amask > 0.5]
    axes[1, 2].imshow(_normalize01(masked))
    axes[1, 2].set_title("Masked Result")
    fig.savefig(os.path.join(
        step_dir, f"object_attention_{target_object}.png"))
    plt.close(fig)
