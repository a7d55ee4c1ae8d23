"""Plain-torch replica of the OpenCLIP ViT text/vision transformer.

open_clip itself is not installed in this image, so — unlike the U-Net/VAE/
resampler oracles, which import the reference's actual modules — the CLIP
towers need this ~100-line replica of the PUBLIC architecture
(mlfoundations/open_clip `transformer.py` / openai CLIP `model.py`) to
oracle against. State-dict key names match open_clip's exactly, so
`convert_clip` / `convert_clip_vision` consume `state_dict()` of these
modules the same way they consume `cond_stage_model.model.*` /
`embedder.model.visual.*` from the VideoCrafter checkpoint.

The forward passes mirror the reference's wrappers, not open_clip's own
(they differ in truncation/pooling):
  * `TextTower.encode_penultimate` = `FrozenOpenCLIPEmbedder.
    encode_with_transformer` + `text_transformer_forward`
    (ref: lvdm/modules/encoders/condition.py:213-231),
  * `TextTower.encode_pooled` = open_clip `CLIP.encode_text`
    (EOT-argmax pool @ text_projection — the CASS metric path),
  * `VisionTower.forward_tokens` = `FrozenOpenCLIPImageEmbedderV2.
    encode_with_vision_transformer` minus preprocess (condition.py:343-375),
  * `VisionTower.forward_pooled` = open_clip `VisionTransformer.forward`
    global-pool branch (the V1 embedder's `self.model.visual(img)`,
    condition.py:288-292).

ViT-H-14 uses plain erf-GELU (`nn.GELU`), NOT the quick-gelu of the
original OpenAI checkpoints — one of the silent-quality-bug traps this
oracle exists to catch.
"""

from __future__ import annotations

from collections import OrderedDict

import torch
from torch import nn


class ResidualAttentionBlock(nn.Module):
    def __init__(self, width: int, heads: int):
        super().__init__()
        self.ln_1 = nn.LayerNorm(width)
        self.attn = nn.MultiheadAttention(width, heads)
        self.ln_2 = nn.LayerNorm(width)
        self.mlp = nn.Sequential(OrderedDict([
            ("c_fc", nn.Linear(width, width * 4)),
            ("gelu", nn.GELU()),
            ("c_proj", nn.Linear(width * 4, width)),
        ]))

    def forward(self, x, attn_mask=None):
        y = self.ln_1(x)
        x = x + self.attn(y, y, y, need_weights=False, attn_mask=attn_mask)[0]
        return x + self.mlp(self.ln_2(x))


class Transformer(nn.Module):
    def __init__(self, width: int, layers: int, heads: int):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [ResidualAttentionBlock(width, heads) for _ in range(layers)])

    def forward(self, x, attn_mask=None):
        for r in self.resblocks:
            x = r(x, attn_mask=attn_mask)
        return x


class TextTower(nn.Module):
    def __init__(self, vocab_size: int = 100, width: int = 64,
                 heads: int = 4, layers: int = 3, context_length: int = 10):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab_size, width)
        self.positional_embedding = nn.Parameter(
            torch.zeros(context_length, width))
        self.transformer = Transformer(width, layers, heads)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter(torch.zeros(width, width))
        mask = torch.empty(context_length, context_length)
        mask.fill_(float("-inf"))
        mask.triu_(1)  # open_clip build_attention_mask: causal
        self.register_buffer("attn_mask", mask, persistent=False)

    def encode_features(self, tokens, layer_idx: int = 1):
        """condition.py:213-231: stop `layer_idx` resblocks before the end
        (1 = penultimate, 0 = last), then ln_final — no pooling."""
        x = self.token_embedding(tokens) + self.positional_embedding
        x = x.permute(1, 0, 2)  # NLD -> LND
        blocks = self.transformer.resblocks
        for i, r in enumerate(blocks):
            if i == len(blocks) - layer_idx:
                break
            x = r(x, attn_mask=self.attn_mask)
        x = x.permute(1, 0, 2)
        return self.ln_final(x)

    def encode_pooled(self, tokens):
        """open_clip CLIP.encode_text: full tower, ln_final, EOT-argmax
        pool, @ text_projection (the CASS/relCASS embedding path)."""
        x = self.encode_features(tokens, layer_idx=0)
        pooled = x[torch.arange(x.shape[0]), tokens.argmax(dim=-1)]
        return pooled @ self.text_projection


class VisionTower(nn.Module):
    def __init__(self, image_size: int = 28, patch_size: int = 14,
                 width: int = 48, heads: int = 4, layers: int = 2,
                 output_dim: int = 32):
        super().__init__()
        grid = image_size // patch_size
        self.conv1 = nn.Conv2d(3, width, patch_size, stride=patch_size,
                               bias=False)
        self.class_embedding = nn.Parameter(torch.zeros(width))
        self.positional_embedding = nn.Parameter(
            torch.zeros(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = Transformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(torch.zeros(width, output_dim))

    def _token_stream(self, x):
        """condition.py:343-368 (input_patchnorm=False branch): patchify,
        class + positional embeddings, ln_pre, transformer in LND."""
        x = self.conv1(x)                                 # [B, w, g, g]
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding.to(x.dtype) + torch.zeros(
            x.shape[0], 1, x.shape[-1], dtype=x.dtype)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding.to(x.dtype)
        x = self.ln_pre(x)
        x = x.permute(1, 0, 2)
        x = self.transformer(x)
        return x.permute(1, 0, 2)

    def forward_tokens(self, x):
        """V2 path: patch-token sequence, NO ln_post/proj
        (condition.py:369-375 returns straight after the transformer)."""
        return self._token_stream(x)

    def forward_pooled(self, x):
        """V1 path = open_clip VisionTransformer.forward: class-token pool
        → ln_post → @ proj (condition.py:288-292 `self.model.visual(img)`)."""
        x = self._token_stream(x)
        return self.ln_post(x[:, 0]) @ self.proj
