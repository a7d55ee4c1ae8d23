"""AE-KL first-stage VAE (Stable-Diffusion flavor), TPU-native Flax.

Re-implements the per-frame 2D autoencoder of the reference
(ref: lvdm/models/autoencoder.py, lvdm/modules/networks/ae_modules.py):
512×320 RGB ↔ 4×40×64 latent, ch=128, ch_mult=(1,2,4,4), 2 res blocks,
no attention except at the bottleneck (attn_resolutions=[] in the shipped
config — only the mid-block attention remains, ae_modules.py:412-421,498-505).

Layout: channels-last [N, H, W, C]; frames are batched on N (the reference's
encode/decode_first_stage_2DAE python loop over frames, ddpm3d.py:485-490,
556-562, becomes one batched call).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from moca_tpu.ops.norms import GroupNorm32
from moca_tpu.utils import distributions


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Mirrors configs/inference_t2v_512_v2.0.yaml:51-72 ddconfig."""

    double_z: bool = True
    z_channels: int = 4
    resolution: int = 512
    in_channels: int = 3
    out_ch: int = 3
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = ()
    embed_dim: int = 4
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32


def _norm(name, param_dtype):
    return GroupNorm32(32, epsilon=1e-6, name=name, param_dtype=param_dtype)


class ResnetBlock(nn.Module):
    """GN→swish→conv ×2 with 1×1 nin shortcut (ae_modules.py:151-...)."""

    out_channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = _norm("norm1", self.param_dtype)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv1")(h)
        h = _norm("norm2", self.param_dtype)(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), dtype=self.dtype,
                    param_dtype=self.param_dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                        param_dtype=self.param_dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head bottleneck self-attention (ae_modules.py:26-80)."""

    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        hid = _norm("norm", self.param_dtype)(x)
        conv1 = lambda name: nn.Conv(c, (1, 1), dtype=self.dtype,
                                     param_dtype=self.param_dtype, name=name)
        q = conv1("q")(hid).reshape(n, h * w, c)
        k = conv1("k")(hid).reshape(n, h * w, c)
        v = conv1("v")(hid).reshape(n, h * w, c)
        logits = jnp.einsum("nqc,nkc->nqk", q, k,
                            preferred_element_type=jnp.float32) * (c**-0.5)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("nqk,nkc->nqc", attn.astype(v.dtype), v)
        out = conv1("proj_out")(out.reshape(n, h, w, c))
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (ae_modules.py:92-110: pad (0,1,0,1))."""

    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="VALID",
                       dtype=self.dtype, param_dtype=self.param_dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    channels: int
    dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), dtype=self.dtype,
                       param_dtype=self.param_dtype, name="conv")(x)


class Encoder(nn.Module):
    """ae_modules.py:364-465."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        common = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        h = nn.Conv(cfg.ch, (3, 3), name="conv_in", **common)(x.astype(cfg.dtype))
        curr_res = cfg.resolution
        for i_level, mult in enumerate(cfg.ch_mult):
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(cfg.ch * mult,
                                name=f"down{i_level}_block{i_block}", **common)(h)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down{i_level}_attn{i_block}", **common)(h)
            if i_level != len(cfg.ch_mult) - 1:
                h = Downsample(h.shape[-1], name=f"down{i_level}_downsample",
                               **common)(h)
                curr_res //= 2
        h = ResnetBlock(h.shape[-1], name="mid_block1", **common)(h)
        h = AttnBlock(name="mid_attn", **common)(h)
        h = ResnetBlock(h.shape[-1], name="mid_block2", **common)(h)
        h = _norm("norm_out", cfg.param_dtype)(h)
        h = nn.silu(h)
        z_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(z_ch, (3, 3), name="conv_out", **common)(h)


class Decoder(nn.Module):
    """ae_modules.py:466-...; num_res_blocks+1 blocks per level, reversed."""

    cfg: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        common = dict(dtype=cfg.dtype, param_dtype=cfg.param_dtype)
        num_levels = len(cfg.ch_mult)
        block_in = cfg.ch * cfg.ch_mult[-1]
        curr_res = cfg.resolution // 2 ** (num_levels - 1)
        h = nn.Conv(block_in, (3, 3), name="conv_in", **common)(z.astype(cfg.dtype))
        h = ResnetBlock(block_in, name="mid_block1", **common)(h)
        h = AttnBlock(name="mid_attn", **common)(h)
        h = ResnetBlock(block_in, name="mid_block2", **common)(h)
        for i_level in reversed(range(num_levels)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out,
                                name=f"up{i_level}_block{i_block}", **common)(h)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"up{i_level}_attn{i_block}", **common)(h)
            if i_level != 0:
                h = Upsample(h.shape[-1], name=f"up{i_level}_upsample", **common)(h)
                curr_res *= 2
        h = _norm("norm_out", cfg.param_dtype)(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_ch, (3, 3), name="conv_out", **common)(h)


class AutoencoderKL(nn.Module):
    """encode → (mean, logvar) moments; decode (autoencoder.py:23-113).

    `quant_conv` / `post_quant_conv` 1×1 convs included (autoencoder.py).
    """

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        common = dict(dtype=self.cfg.dtype, param_dtype=self.cfg.param_dtype)
        mult = 2 if self.cfg.double_z else 1
        self.quant_conv = nn.Conv(mult * self.cfg.embed_dim, (1, 1),
                                  name="quant_conv", **common)
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       name="post_quant_conv", **common)

    def encode_moments(self, x):
        """[N,H,W,3] → (mean, logvar) each [N,h,w,z] (logvar clamped ±[-30,20],
        ref lvdm/distributions.py)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, rng=None, sample: bool = True):
        """Posterior sample (the reference's default encode path,
        ddpm3d.py:458-465) or mode when sample=False / rng None."""
        mean, logvar = self.encode_moments(x)
        if sample and rng is not None:
            return distributions.sample(mean, logvar, rng)
        return mean

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, rng=None, sample: bool = False):
        z = self.encode(x, rng=rng, sample=sample)
        return self.decode(z)
