"""OpenCLIP ViT-H/14 text tower in Flax (penultimate-layer encoder).

Replaces the reference's `FrozenOpenCLIPEmbedder`
(ref: lvdm/modules/encoders/condition.py:174-235): OpenCLIP ViT-H-14 text
transformer, 77 tokens, width 1024, 16 heads, 24 layers; `layer="penultimate"`
stops one resblock early and then applies ln_final (condition.py:213-231).

Weights come from the VideoCrafter checkpoint (cond_stage_model.*) via
models/convert.py. Tokenization lives in models/tokenizer.py (host-side).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True  # condition.py:199-203 (layer_idx=1)
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


class _LN32(nn.Module):
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=self.param_dtype)(
            x.astype(jnp.float32))
        return y.astype(x.dtype)


class ResidualAttentionBlock(nn.Module):
    """ln_1 → causal MHA → ln_2 → MLP(×4, quick-gelu? no: OpenCLIP uses gelu)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, x, mask):
        c = self.cfg
        d = c.width // c.heads
        h = _LN32(c.param_dtype, name="ln_1")(x)
        qkv = nn.Dense(3 * c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                       name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, s = q.shape[0], q.shape[1]
        q = q.reshape(b, s, c.heads, d)
        k = k.reshape(b, s, c.heads, d)
        v = v.reshape(b, s, c.heads, d)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (d**-0.5)
        logits = logits + mask
        probs = jax.nn.softmax(logits, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        attn = attn.reshape(b, s, c.width)
        x = x + nn.Dense(c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                         name="out_proj")(attn)
        h = _LN32(c.param_dtype, name="ln_2")(x)
        h = nn.Dense(4 * c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                     name="c_fc")(h)
        h = nn.gelu(h, approximate=False)
        x = x + nn.Dense(c.width, dtype=c.dtype, param_dtype=c.param_dtype,
                         name="c_proj")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """tokens [B, 77] int32 → [B, 77, width] penultimate-layer features
    (conditioning path), or — with output="embed" — the pooled, projected
    CLIP text EMBEDDING [B, output_dim] used for similarity metrics
    (CASS/relCASS, eval/metrics.py): full tower, ln_final, EOT-token pool
    (argmax over token ids, the OpenCLIP convention), @ text_projection.
    The embed path needs the last resblock + text_projection converted
    (convert_clip(full=True)); the checkpoint carries them
    (FrozenOpenCLIPEmbedder keeps the whole text tower and truncates at
    runtime, condition.py:213-231)."""

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, tokens, output: str = "penultimate"):
        c = self.cfg
        tok_emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (c.vocab_size, c.width), c.param_dtype)
        pos_emb = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (c.context_length, c.width), c.param_dtype)
        x = tok_emb[tokens].astype(c.dtype) + pos_emb.astype(c.dtype)

        s = tokens.shape[1]
        causal = jnp.tril(jnp.ones((s, s), jnp.bool_))
        mask = jnp.where(causal, 0.0, -jnp.inf)[None, None]

        n_layers = c.layers - (1 if c.penultimate and output != "embed" else 0)
        for i in range(n_layers):
            x = ResidualAttentionBlock(c, name=f"resblock{i}")(x, mask)
        # ln_final is applied even in penultimate mode (condition.py:211-218)
        x = _LN32(c.param_dtype, name="ln_final")(x)
        if output != "embed":
            return x
        proj = self.param("text_projection", nn.initializers.normal(0.02),
                          (c.width, c.width), c.param_dtype)
        eot = jnp.argmax(tokens, axis=-1)  # EOT has the largest token id
        pooled = x[jnp.arange(x.shape[0]), eot]
        return pooled @ proj.astype(pooled.dtype)
