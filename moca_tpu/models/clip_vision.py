"""OpenCLIP ViT-H/14 vision tower (for the i2v model family).

Flax re-implementation of `FrozenOpenCLIPImageEmbedder` / `...V2`
(ref: lvdm/modules/encoders/condition.py:238-375): bicubic 224² resize +
CLIP normalization, patch-14 ViT, width 1280, 32 layers; `pooled` output is
the projected class token (1024-d) for ImageProjModel, `tokens` output is
the patch-token sequence (1280-d) for the fine-grained Resampler (V2 drops
the final projection).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

_CLIP_MEAN = jnp.asarray([0.48145466, 0.4578275, 0.40821073])
_CLIP_STD = jnp.asarray([0.26862954, 0.26130258, 0.27577711])


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1280
    heads: int = 16
    layers: int = 32
    output_dim: int = 1024
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def _cubic(x: "np.ndarray", a: float) -> "np.ndarray":
    import numpy as np

    ax = np.abs(x)
    return np.where(
        ax <= 1, (a + 2) * ax**3 - (a + 3) * ax**2 + 1,
        np.where(ax < 2, a * (ax**3 - 5 * ax**2 + 8 * ax - 4), 0.0))


def bicubic_resize_weights(in_size: int, out_size: int,
                           align_corners: bool = True,
                           antialias: bool = True) -> "np.ndarray":
    """[out, in] 1-D resampling matrix with EXACT torch `F.interpolate`
    bicubic semantics (validated element-wise against CPU torch in
    tests/test_oracle_i2v.py) — the reference's kornia.geometry.resize
    (condition.py:266-269) delegates to the same kernel.

    antialias=True: a=-0.5 kernel, width scaled by max(scale, 1), taps
    renormalized; centers at scale·(d+0.5)−0.5 with the align_corners scale.
    antialias=False: classic 4-tap a=-0.75 with border-clamped taps.
    """
    import numpy as np

    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
    else:
        scale = in_size / out_size
    d = np.arange(out_size)
    if antialias:
        centers = scale * (d + 0.5) - 0.5
        inv = 1.0 / max(scale, 1.0)
        j = np.arange(in_size)
        w = _cubic((j[None] - centers[:, None]) * inv, -0.5)
        return (w / w.sum(-1, keepdims=True)).astype(np.float32)
    centers = scale * d if align_corners else scale * (d + 0.5) - 0.5
    W = np.zeros((out_size, in_size), np.float32)
    base = np.floor(centers).astype(int)
    for o in range(out_size):
        for k in range(-1, 3):
            idx = base[o] + k
            W[o, np.clip(idx, 0, in_size - 1)] += _cubic(
                np.float64(idx - centers[o]), -0.75)
    return W


def resize_bicubic(images: jnp.ndarray, out_hw,
                   align_corners: bool = True,
                   antialias: bool = True) -> jnp.ndarray:
    """[B, H, W, C] → [B, out_h, out_w, C], torch-exact separable bicubic
    (weights precomputed in numpy at trace time — shapes are static)."""
    h, w = images.shape[1], images.shape[2]
    wh = jnp.asarray(bicubic_resize_weights(h, out_hw[0], align_corners,
                                            antialias))
    ww = jnp.asarray(bicubic_resize_weights(w, out_hw[1], align_corners,
                                            antialias))
    x = jnp.einsum("oh,bhwc->bowc", wh, images.astype(jnp.float32))
    return jnp.einsum("pw,bowc->bopc", ww, x)


def preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] in [-1,1] → CLIP-normalized [B,224,224,3]
    (condition.py:264-272: kornia bicubic resize with align_corners=True,
    antialias=True, then (x+1)/2 and CLIP mean/std)."""
    x = resize_bicubic(images, (image_size, image_size),
                       align_corners=True, antialias=True)
    x = (x + 1.0) / 2.0
    return (x - _CLIP_MEAN) / _CLIP_STD


class _VisionBlock(nn.Module):
    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        d = c.width // c.heads
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=c.param_dtype, name=name)
        h = ln("ln_1")(x.astype(jnp.float32)).astype(c.dtype)
        qkv = nn.Dense(3 * c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                       name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = q.shape[0], q.shape[1]
        q = q.reshape(b, s, c.heads, d)
        k = k.reshape(b, s, c.heads, d)
        v = v.reshape(b, s, c.heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        x = x + nn.Dense(c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                         name="out_proj")(attn.reshape(b, s, c.width))
        h = ln("ln_2")(x.astype(jnp.float32)).astype(c.dtype)
        h = nn.Dense(4 * c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        return x + nn.Dense(c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                            name="c_proj")(h)


class CLIPVisionEncoder(nn.Module):
    """images [B,H,W,3] in [-1,1] → pooled [B,1024] or tokens [B,257,1280]."""

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, images, output: str = "pooled"):
        c = self.cfg
        x = preprocess(images, c.image_size).astype(c.dtype)
        x = nn.Conv(c.width, (c.patch_size, c.patch_size),
                    strides=(c.patch_size, c.patch_size), use_bias=False,
                    dtype=c.dtype, param_dtype=c.param_dtype, name="patch")(x)
        b, gh, gw, _ = x.shape
        x = x.reshape(b, gh * gw, c.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.width,), c.param_dtype)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.width)).astype(c.dtype), x], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(0.02),
                         (gh * gw + 1, c.width), c.param_dtype)
        x = x + pos.astype(c.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=c.param_dtype,
                         name="ln_pre")(x.astype(jnp.float32)).astype(c.dtype)
        for i in range(c.layers):
            x = _VisionBlock(c, name=f"resblock{i}")(x)
        if output == "tokens":
            # V2 path: patch tokens without final projection
            # (condition.py:330-375 encode_with_vision_transformer)
            return x
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=c.param_dtype,
                         name="ln_post")(
            x[:, 0].astype(jnp.float32)).astype(c.dtype)
        proj = self.param("proj", nn.initializers.normal(0.02),
                          (c.width, c.output_dim), c.param_dtype)
        return x @ proj.astype(c.dtype)
