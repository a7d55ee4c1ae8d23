"""Image-prompt projection for the i2v model family (LatentVisualDiffusion).

Flax re-implementation of the IP-Adapter-style projectors
(ref: lvdm/modules/encoders/ip_resampler.py): `ImageProjModel` maps a pooled
CLIP image embedding to N cross-attention tokens; `Resampler` is the
fine-grained Perceiver variant over patch tokens.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class ImageProjModel(nn.Module):
    """pooled CLIP embed [B, D_clip] → [B, N, D_cross] (ip_resampler.py:7-21)."""

    cross_attention_dim: int = 1024
    clip_extra_context_tokens: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, image_embeds):
        b = image_embeds.shape[0]
        x = nn.Dense(self.clip_extra_context_tokens * self.cross_attention_dim,
                     dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj")(image_embeds)
        x = x.reshape(b, self.clip_extra_context_tokens,
                      self.cross_attention_dim)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="norm")(x.astype(jnp.float32)).astype(self.dtype)


class PerceiverAttention(nn.Module):
    """Latents attend to [image tokens ‖ latents] (ip_resampler.py:45-90).

    Uses the double-sqrt scaling trick: logits = (q·s)(k·s)ᵀ, s = d^-1/4.
    """

    dim_head: int = 64
    heads: int = 8
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, latents):
        h, d = self.heads, self.dim_head
        inner = h * d
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32,
                                       param_dtype=self.param_dtype, name=name)
        x = ln("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        latents = ln("norm2")(latents.astype(jnp.float32)).astype(self.dtype)
        b, l, _ = latents.shape

        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, dtype=self.dtype,
            param_dtype=self.param_dtype, name=name)
        q = dense(inner, "to_q")(latents)
        kv = dense(inner * 2, "to_kv")(jnp.concatenate([x, latents], axis=-2))
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], h, d).transpose(0, 2, 1, 3)

        qh, kh, vh = heads_first(q), heads_first(k), heads_first(v)
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(d)))
        logits = jnp.einsum("bhqd,bhkd->bhqk", qh * scale, kh * scale,
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits, axis=-1).astype(vh.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, l, inner)
        return dense(latents.shape[-1], "to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler (ip_resampler.py:93-135)."""

    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b = x.shape[0]
        lat0 = self.param(
            "latents",
            lambda k, s: jax.random.normal(k, s) / self.dim**0.5,
            (1, self.num_queries, self.dim))
        latents = jnp.broadcast_to(lat0, (b,) + lat0.shape[1:]).astype(self.dtype)
        x = nn.Dense(self.dim, dtype=self.dtype, param_dtype=self.param_dtype,
                     name="proj_in")(x)
        for i in range(self.depth):
            attn = PerceiverAttention(
                dim_head=self.dim_head, heads=self.heads, dtype=self.dtype,
                param_dtype=self.param_dtype, name=f"layer{i}_attn")
            latents = attn(x, latents) + latents
            h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                             name=f"layer{i}_ff_norm")(
                latents.astype(jnp.float32)).astype(self.dtype)
            h = nn.Dense(self.dim * self.ff_mult, use_bias=False,
                         dtype=self.dtype, param_dtype=self.param_dtype,
                         name=f"layer{i}_ff_in")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                         param_dtype=self.param_dtype,
                         name=f"layer{i}_ff_out")(h)
            latents = h + latents
        out = nn.Dense(self.output_dim, dtype=self.dtype,
                       param_dtype=self.param_dtype, name="proj_out")(latents)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype,
                            name="norm_out")(
            out.astype(jnp.float32)).astype(self.dtype)
