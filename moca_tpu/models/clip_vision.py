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


def preprocess(images: jnp.ndarray, image_size: int = 224) -> jnp.ndarray:
    """[B,H,W,3] in [-1,1] → CLIP-normalized [B,224,224,3]
    (condition.py:264-272: bicubic resize, (x+1)/2, mean/std)."""
    b = images.shape[0]
    x = jax.image.resize(images, (b, image_size, image_size, 3), "bicubic")
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
