"""Converter ↔ model structural agreement.

Builds a synthetic torch-layout state dict with the reference's key naming
(openaimodel3d.py / ae_modules.py / open_clip), converts it, and checks the
resulting tree has EXACTLY the structure+shapes the Flax models initialize —
any naming or layout drift fails here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from moca_tpu.models.convert import convert_clip, convert_unet, convert_vae
from moca_tpu.models.unet3d import UNetConfig, UNet3D, unet_plan
from moca_tpu.models.vae import AutoencoderKL, VAEConfig


UCFG = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                  channel_mult=(1, 2), attention_resolutions=(1, 2),
                  num_res_blocks=1, temporal_length=4)
VCFG = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
CCFG = CLIPTextConfig(width=16, heads=2, layers=2)


def _syn_unet_sd(cfg: UNetConfig):
    """Reference-named random state dict for the tiny UNet."""
    sd = {}
    rng = np.random.default_rng(0)
    r = lambda *s: rng.normal(size=s).astype(np.float32)
    ed = cfg.time_embed_dim

    def lin(p, i, o):
        sd[f"{p}.weight"] = r(o, i)
        sd[f"{p}.bias"] = r(o)

    def lin_nb(p, i, o):
        sd[f"{p}.weight"] = r(o, i)

    def conv2(p, i, o, k=3):
        sd[f"{p}.weight"] = r(o, i, k, k)
        sd[f"{p}.bias"] = r(o)

    def conv3(p, i, o, kt=3):
        sd[f"{p}.weight"] = r(o, i, kt, 1, 1)
        sd[f"{p}.bias"] = r(o)

    def norm(p, c):
        sd[f"{p}.weight"] = r(c)
        sd[f"{p}.bias"] = r(c)

    def res(p, ic, oc):
        norm(f"{p}.in_layers.0", ic)
        conv2(f"{p}.in_layers.2", ic, oc)
        lin(f"{p}.emb_layers.1", ed, oc)
        norm(f"{p}.out_layers.0", oc)
        conv2(f"{p}.out_layers.3", oc, oc)
        if ic != oc:
            conv2(f"{p}.skip_connection", ic, oc, k=1)
        if cfg.temporal_conv:
            for i in range(1, 5):
                norm(f"{p}.temopral_conv.conv{i}.0", oc)
                conv3(f"{p}.temopral_conv.conv{i}.{2 if i == 1 else 3}", oc, oc)

    def basic_block(p, dim, ctx):
        for n in ("norm1", "norm2", "norm3"):
            norm(f"{p}.{n}", dim)
        for attn, cdim in (("attn1", dim), ("attn2", ctx or dim)):
            lin_nb(f"{p}.{attn}.to_q", dim, dim)
            lin_nb(f"{p}.{attn}.to_k", cdim, dim)
            lin_nb(f"{p}.{attn}.to_v", cdim, dim)
            lin(f"{p}.{attn}.to_out.0", dim, dim)
        lin(f"{p}.ff.net.0.proj", dim, dim * 8)
        lin(f"{p}.ff.net.2", dim * 4, dim)

    def transformer(p, ch, heads, dim_head, ctx):
        inner = heads * dim_head
        norm(f"{p}.norm", ch)
        lin(f"{p}.proj_in", ch, inner)
        lin(f"{p}.proj_out", inner, ch)
        basic_block(f"{p}.transformer_blocks.0", inner, ctx)

    lin("time_embed.0", cfg.model_channels, ed)
    lin("time_embed.2", ed, ed)
    if cfg.fps_cond:
        lin("fps_embedding.0", cfg.model_channels, ed)
        lin("fps_embedding.2", ed, ed)

    in_plan, mid_plan, out_plan = unet_plan(cfg)

    def emit(spec, p):
        k = spec["kind"]
        if k == "conv_in":
            conv2(p, spec["in_ch"], spec["out_ch"])
        elif k == "res":
            res(p, spec["in_ch"], spec["out_ch"])
        elif k == "spatial":
            transformer(p, spec["in_ch"], spec["heads"], spec["dim_head"],
                        cfg.context_dim)
        elif k == "temporal":
            transformer(p, spec["in_ch"], spec["heads"], spec["dim_head"],
                        None)
        elif k == "down":
            conv2(f"{p}.op", spec["in_ch"], spec["out_ch"])
        elif k == "up":
            conv2(f"{p}.conv", spec["in_ch"], spec["out_ch"])

    for i, block in enumerate(in_plan):
        for j, spec in enumerate(block):
            emit(spec, f"input_blocks.{i}.{j}")
    if cfg.addition_attention:
        transformer("init_attn.0", cfg.model_channels, 8,
                    cfg.num_head_channels, None)
    for j, spec in enumerate(mid_plan):
        emit(spec, f"middle_block.{j}")
    for i, block in enumerate(out_plan):
        for j, spec in enumerate(block):
            emit(spec, f"output_blocks.{i}.{j}")
    norm("out.0", cfg.model_channels)
    conv2("out.2", cfg.model_channels, cfg.out_channels)
    return {f"model.diffusion_model.{k}": v for k, v in sd.items()}


def _tree_shapes(tree):
    return jax.tree.map(lambda x: jnp.shape(x), tree)


def test_unet_convert_structure_matches_init():
    sd = _syn_unet_sd(UCFG)
    converted = convert_unet(sd, UCFG)
    m = UNet3D(UCFG)
    ref = m.init(jax.random.PRNGKey(0),
                 jnp.zeros((1, 4, 8, 8, 4)), jnp.zeros((1, 4), jnp.int32),
                 jnp.zeros((1, 7, UCFG.context_dim)), fps=16)
    assert _tree_shapes(converted) == _tree_shapes(ref)
    # converted params actually run
    y = m.apply(converted, jnp.ones((1, 4, 8, 8, 4)) * 0.1,
                jnp.full((1, 4), 500, jnp.int32),
                jnp.zeros((1, 7, UCFG.context_dim)), fps=16)
    assert np.isfinite(np.asarray(y)).all()


def _syn_vae_sd(cfg: VAEConfig):
    sd = {}
    rng = np.random.default_rng(1)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05

    def conv(p, i, o, k=3):
        sd[f"{p}.weight"] = r(o, i, k, k)
        sd[f"{p}.bias"] = r(o)

    def norm(p, c):
        sd[f"{p}.weight"] = r(c) + 1
        sd[f"{p}.bias"] = r(c)

    def res(p, ic, oc):
        norm(f"{p}.norm1", ic)
        conv(f"{p}.conv1", ic, oc)
        norm(f"{p}.norm2", oc)
        conv(f"{p}.conv2", oc, oc)
        if ic != oc:
            conv(f"{p}.nin_shortcut", ic, oc, k=1)

    def attn(p, c):
        norm(f"{p}.norm", c)
        for q in ("q", "k", "v", "proj_out"):
            conv(f"{p}.{q}", c, c, k=1)

    ch = cfg.ch
    conv("encoder.conv_in", cfg.in_channels, ch)
    block_in = ch
    for i, mult in enumerate(cfg.ch_mult):
        for b in range(cfg.num_res_blocks):
            res(f"encoder.down.{i}.block.{b}", block_in, ch * mult)
            block_in = ch * mult
        if i != len(cfg.ch_mult) - 1:
            conv(f"encoder.down.{i}.downsample.conv", block_in, block_in)
    res("encoder.mid.block_1", block_in, block_in)
    attn("encoder.mid.attn_1", block_in)
    res("encoder.mid.block_2", block_in, block_in)
    norm("encoder.norm_out", block_in)
    zc = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
    conv("encoder.conv_out", block_in, zc)

    conv("decoder.conv_in", cfg.z_channels, block_in)
    res("decoder.mid.block_1", block_in, block_in)
    attn("decoder.mid.attn_1", block_in)
    res("decoder.mid.block_2", block_in, block_in)
    for i in reversed(range(len(cfg.ch_mult))):
        block_out = ch * cfg.ch_mult[i]
        for b in range(cfg.num_res_blocks + 1):
            res(f"decoder.up.{i}.block.{b}", block_in, block_out)
            block_in = block_out
        if i != 0:
            conv(f"decoder.up.{i}.upsample.conv", block_in, block_in)
    norm("decoder.norm_out", block_in)
    conv("decoder.conv_out", block_in, cfg.out_ch)
    conv("quant_conv", zc, 2 * cfg.embed_dim, k=1)
    conv("post_quant_conv", cfg.embed_dim, cfg.z_channels, k=1)
    return {f"first_stage_model.{k}": v for k, v in sd.items()}


def test_vae_convert_structure_matches_init():
    sd = _syn_vae_sd(VCFG)
    converted = convert_vae(sd, VCFG)
    m = AutoencoderKL(VCFG)
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    assert _tree_shapes(converted) == _tree_shapes(ref)
    x = jnp.ones((2, 32, 32, 3)) * 0.1
    recon = m.apply(converted, x)
    assert recon.shape == (2, 32, 32, 3)
    mean, logvar = m.apply(converted, x, method=m.encode_moments)
    # VCFG has 2 levels → one 2× downsample: 32 → 16
    assert mean.shape == (2, 16, 16, VCFG.embed_dim)


def _syn_clip_sd(cfg: CLIPTextConfig):
    sd = {}
    rng = np.random.default_rng(2)
    r = lambda *s: rng.normal(size=s).astype(np.float32) * 0.05
    sd["token_embedding.weight"] = r(cfg.vocab_size, cfg.width)
    sd["positional_embedding"] = r(cfg.context_length, cfg.width)
    sd["ln_final.weight"] = r(cfg.width) + 1
    sd["ln_final.bias"] = r(cfg.width)
    for i in range(cfg.layers):
        p = f"transformer.resblocks.{i}"
        for n in ("ln_1", "ln_2"):
            sd[f"{p}.{n}.weight"] = r(cfg.width) + 1
            sd[f"{p}.{n}.bias"] = r(cfg.width)
        sd[f"{p}.attn.in_proj_weight"] = r(3 * cfg.width, cfg.width)
        sd[f"{p}.attn.in_proj_bias"] = r(3 * cfg.width)
        sd[f"{p}.attn.out_proj.weight"] = r(cfg.width, cfg.width)
        sd[f"{p}.attn.out_proj.bias"] = r(cfg.width)
        sd[f"{p}.mlp.c_fc.weight"] = r(4 * cfg.width, cfg.width)
        sd[f"{p}.mlp.c_fc.bias"] = r(4 * cfg.width)
        sd[f"{p}.mlp.c_proj.weight"] = r(cfg.width, 4 * cfg.width)
        sd[f"{p}.mlp.c_proj.bias"] = r(cfg.width)
    return {f"cond_stage_model.model.{k}": v for k, v in sd.items()}


def test_clip_convert_structure_matches_init():
    sd = _syn_clip_sd(CCFG)
    converted = convert_clip(sd, CCFG)
    m = CLIPTextEncoder(CCFG)
    ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    assert _tree_shapes(converted) == _tree_shapes(ref)
    out = m.apply(converted, jnp.ones((2, 77), jnp.int32))
    assert out.shape == (2, 77, CCFG.width)
    # penultimate mode uses layers-1 resblocks (condition.py:199-231)
    assert f"resblock{CCFG.layers - 1}" not in converted["params"]
