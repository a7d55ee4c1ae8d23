"""PyTorch VideoCrafter2 checkpoint → Flax parameter conversion.

The reference loads a single `model.ckpt` LatentDiffusion state_dict
(ref: scripts/evaluation/funcs.py:487-503, with DeepSpeed-dict fallback).
This module splits that state dict into the three frozen towers and converts
each to the moca_tpu Flax trees:

    model.diffusion_model.*   → UNet3D        (convert_unet)
    first_stage_model.*       → AutoencoderKL (convert_vae)
    cond_stage_model.model.*  → CLIPTextEncoder (convert_clip)

Tensor layout transforms:
    Linear  [out,in]        → kernel [in,out]
    Conv2d  [O,I,kh,kw]     → kernel [kh,kw,I,O]
    Conv3d  [O,I,kt,kh,kw]  → kernel [kt,kh,kw,I,O]
    Norm weight/bias        → scale/bias

The UNet mapping walks the SAME `unet_plan` the Flax model builds from, so
module naming cannot drift from the weight mapping.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from moca_tpu.models.unet3d import UNetConfig, unet_plan
from moca_tpu.models.vae import VAEConfig
from moca_tpu.models.clip_text import CLIPTextConfig

Array = np.ndarray
StateDict = Mapping[str, "np.ndarray"]


def _np(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor without importing torch at module scope
    return t.detach().to("cpu").float().numpy()


def _linear(sd, prefix, bias=True):
    out = {"kernel": _np(sd[f"{prefix}.weight"]).T}
    if bias:
        out["bias"] = _np(sd[f"{prefix}.bias"])
    return out


def _conv2d(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _conv3d(sd, prefix):
    return {
        "kernel": _np(sd[f"{prefix}.weight"]).transpose(2, 3, 4, 1, 0),
        "bias": _np(sd[f"{prefix}.bias"]),
    }


def _norm(sd, prefix):
    return {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}


def _groupnorm32(sd, prefix):
    # GroupNorm32 wraps an anonymous nn.GroupNorm
    return {"GroupNorm_0": _norm(sd, prefix)}


def _layernorm32(sd, prefix):
    return {"LayerNorm_0": _norm(sd, prefix)}


# ---------------------------------------------------------------------------
# U-Net
# ---------------------------------------------------------------------------

def _res_block(sd, p):
    """ResBlock params (openaimodel3d.py:149-193). Note the reference's
    'temopral_conv' attribute typo (openaimodel3d.py:188) is part of the
    checkpoint key namespace."""
    out = {
        "in_norm": _groupnorm32(sd, f"{p}.in_layers.0"),
        "in_conv": _conv2d(sd, f"{p}.in_layers.2"),
        "emb_proj": _linear(sd, f"{p}.emb_layers.1"),
        "out_norm": _groupnorm32(sd, f"{p}.out_layers.0"),
        "out_conv": _conv2d(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv2d(sd, f"{p}.skip_connection")
    if f"{p}.temopral_conv.conv1.2.weight" in sd:
        tc = {}
        for i in range(1, 5):
            tc[f"conv{i}_norm"] = _groupnorm32(sd, f"{p}.temopral_conv.conv{i}.0")
            # Sequential index of the Conv3d: conv1 = (GN,SiLU,Conv) → 2;
            # conv2..4 = (GN,SiLU,Dropout,Conv) → 3 (openaimodel3d.py:252-263)
            idx = 2 if i == 1 else 3
            tc[f"conv{i}_conv"] = _conv3d(sd, f"{p}.temopral_conv.conv{i}.{idx}")
        out["temporal"] = tc
    return out


def _attn(sd, p, has_rel_pos=False, img_cross=False):
    out = {
        "to_q": _linear(sd, f"{p}.to_q", bias=False),
        "to_k": _linear(sd, f"{p}.to_k", bias=False),
        "to_v": _linear(sd, f"{p}.to_v", bias=False),
        "to_out": _linear(sd, f"{p}.to_out.0"),
    }
    if has_rel_pos and f"{p}.relative_position_k.embeddings_table" in sd:
        out["relative_position_k"] = {
            "embeddings_table": _np(sd[f"{p}.relative_position_k.embeddings_table"])}
        out["relative_position_v"] = {
            "embeddings_table": _np(sd[f"{p}.relative_position_v.embeddings_table"])}
    if img_cross and f"{p}.to_k_ip.weight" in sd:
        out["to_k_ip"] = _linear(sd, f"{p}.to_k_ip", bias=False)
        out["to_v_ip"] = _linear(sd, f"{p}.to_v_ip", bias=False)
    return out


def _basic_block(sd, p, rel_pos=False, img_cross=False):
    return {
        "norm1": _layernorm32(sd, f"{p}.norm1"),
        "norm2": _layernorm32(sd, f"{p}.norm2"),
        "norm3": _layernorm32(sd, f"{p}.norm3"),
        "attn1": _attn(sd, f"{p}.attn1", has_rel_pos=rel_pos),
        "attn2": _attn(sd, f"{p}.attn2", has_rel_pos=rel_pos, img_cross=img_cross),
        "ff": {
            "geglu": {"proj": _linear(sd, f"{p}.ff.net.0.proj")},
            "out": _linear(sd, f"{p}.ff.net.2"),
        },
    }


def _proj(sd, prefix):
    """Transformer proj_in/proj_out: nn.Linear when use_linear=True, but a
    1×1 Conv1d/Conv2d when use_linear=False — notably the U-Net's init_attn
    TemporalTransformer is constructed WITHOUT use_linear
    (openaimodel3d.py:379-389 → attention.py:297-300), so its projections
    are Conv1d in the checkpoint. A 1×1 conv over channels is exactly a
    Linear: squeeze the kernel's trailing singleton dims."""
    w = _np(sd[f"{prefix}.weight"])
    if w.ndim > 2:
        w = w.reshape(w.shape[0], w.shape[1])
    return {"kernel": w.T, "bias": _np(sd[f"{prefix}.bias"])}


def _transformer(sd, p, depth, rel_pos=False, img_cross=False):
    out = {
        "norm": _groupnorm32(sd, f"{p}.norm"),
        "proj_in": _proj(sd, f"{p}.proj_in"),
        "proj_out": _proj(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        out[f"block{d}"] = _basic_block(
            sd, f"{p}.transformer_blocks.{d}", rel_pos=rel_pos, img_cross=img_cross)
    return out


def convert_unet(sd: StateDict, cfg: UNetConfig,
                 prefix: str = "model.diffusion_model.") -> Dict:
    """torch state_dict → UNet3D params['params'] tree."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    in_plan, mid_plan, out_plan = unet_plan(cfg)
    params: Dict = {}

    params["time_embed_0"] = _linear(sd, "time_embed.0")
    params["time_embed_2"] = _linear(sd, "time_embed.2")
    if cfg.fps_cond:
        params["fps_embed_0"] = _linear(sd, "fps_embedding.0")
        params["fps_embed_2"] = _linear(sd, "fps_embedding.2")

    def convert_layer(spec, torch_prefix):
        kind = spec["kind"]
        if kind == "conv_in":
            return _conv2d(sd, torch_prefix)
        if kind == "res":
            return _res_block(sd, torch_prefix)
        if kind == "spatial":
            return _transformer(sd, torch_prefix, cfg.transformer_depth,
                                img_cross=cfg.use_image_attention)
        if kind == "temporal":
            return _transformer(sd, torch_prefix, cfg.temporal_transformer_depth,
                                rel_pos=cfg.use_relative_position)
        if kind == "down":
            return {"conv": _conv2d(sd, f"{torch_prefix}.op")}
        if kind == "up":
            return {"conv": _conv2d(sd, f"{torch_prefix}.conv")}
        raise ValueError(kind)

    suffix = {"conv_in": "conv", "res": "res", "spatial": "spatial",
              "temporal": "temporal", "down": "down", "up": "up"}

    for i, block in enumerate(in_plan):
        for j, spec in enumerate(block):
            params[f"in{i}_{j}_{suffix[spec['kind']]}"] = convert_layer(
                spec, f"input_blocks.{i}.{j}")
    if cfg.addition_attention:
        params["init_temporal"] = _transformer(
            sd, "init_attn.0", 1, rel_pos=cfg.use_relative_position)
    for j, spec in enumerate(mid_plan):
        params[f"mid_{j}_{suffix[spec['kind']]}"] = convert_layer(
            spec, f"middle_block.{j}")
    for i, block in enumerate(out_plan):
        for j, spec in enumerate(block):
            params[f"out{i}_{j}_{suffix[spec['kind']]}"] = convert_layer(
                spec, f"output_blocks.{i}.{j}")

    params["out_norm"] = _groupnorm32(sd, "out.0")
    params["out_conv"] = _conv2d(sd, "out.2")
    return {"params": params}


# ---------------------------------------------------------------------------
# VAE
# ---------------------------------------------------------------------------

def _vae_resblock(sd, p):
    out = {
        "norm1": _groupnorm32(sd, f"{p}.norm1"),
        "conv1": _conv2d(sd, f"{p}.conv1"),
        "norm2": _groupnorm32(sd, f"{p}.norm2"),
        "conv2": _conv2d(sd, f"{p}.conv2"),
    }
    if f"{p}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv2d(sd, f"{p}.nin_shortcut")
    return out


def _vae_attn(sd, p):
    return {
        "norm": _groupnorm32(sd, f"{p}.norm"),
        "q": _conv2d(sd, f"{p}.q"),
        "k": _conv2d(sd, f"{p}.k"),
        "v": _conv2d(sd, f"{p}.v"),
        "proj_out": _conv2d(sd, f"{p}.proj_out"),
    }


def convert_vae(sd: StateDict, cfg: VAEConfig,
                prefix: str = "first_stage_model.") -> Dict:
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    enc: Dict = {"conv_in": _conv2d(sd, "encoder.conv_in")}
    curr_res = cfg.resolution
    for i, mult in enumerate(cfg.ch_mult):
        for b in range(cfg.num_res_blocks):
            enc[f"down{i}_block{b}"] = _vae_resblock(sd, f"encoder.down.{i}.block.{b}")
            if curr_res in cfg.attn_resolutions:
                enc[f"down{i}_attn{b}"] = _vae_attn(sd, f"encoder.down.{i}.attn.{b}")
        if i != len(cfg.ch_mult) - 1:
            enc[f"down{i}_downsample"] = {
                "conv": _conv2d(sd, f"encoder.down.{i}.downsample.conv")}
            curr_res //= 2
    enc["mid_block1"] = _vae_resblock(sd, "encoder.mid.block_1")
    enc["mid_attn"] = _vae_attn(sd, "encoder.mid.attn_1")
    enc["mid_block2"] = _vae_resblock(sd, "encoder.mid.block_2")
    enc["norm_out"] = _groupnorm32(sd, "encoder.norm_out")
    enc["conv_out"] = _conv2d(sd, "encoder.conv_out")

    dec: Dict = {"conv_in": _conv2d(sd, "decoder.conv_in")}
    dec["mid_block1"] = _vae_resblock(sd, "decoder.mid.block_1")
    dec["mid_attn"] = _vae_attn(sd, "decoder.mid.attn_1")
    dec["mid_block2"] = _vae_resblock(sd, "decoder.mid.block_2")
    curr_res = cfg.resolution // 2 ** (len(cfg.ch_mult) - 1)
    for i in reversed(range(len(cfg.ch_mult))):
        for b in range(cfg.num_res_blocks + 1):
            dec[f"up{i}_block{b}"] = _vae_resblock(sd, f"decoder.up.{i}.block.{b}")
            if curr_res in cfg.attn_resolutions:
                dec[f"up{i}_attn{b}"] = _vae_attn(sd, f"decoder.up.{i}.attn.{b}")
        if i != 0:
            dec[f"up{i}_upsample"] = {
                "conv": _conv2d(sd, f"decoder.up.{i}.upsample.conv")}
            curr_res *= 2
    dec["norm_out"] = _groupnorm32(sd, "decoder.norm_out")
    dec["conv_out"] = _conv2d(sd, "decoder.conv_out")

    return {"params": {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv2d(sd, "quant_conv"),
        "post_quant_conv": _conv2d(sd, "post_quant_conv"),
    }}


# ---------------------------------------------------------------------------
# CLIP text tower
# ---------------------------------------------------------------------------

def convert_clip(sd: StateDict, cfg: CLIPTextConfig,
                 prefix: str = "cond_stage_model.model.",
                 full: bool = False) -> Dict:
    """OpenCLIP text tower (cond_stage_model.model.* in the LVDM checkpoint).

    full=True additionally converts the last resblock + text_projection,
    enabling the pooled CLIP text EMBEDDING path (CASS/relCASS metrics) —
    the checkpoint carries the whole tower even though conditioning stops at
    the penultimate layer (condition.py:213-231)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {
        "token_embedding": _np(sd["token_embedding.weight"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "ln_final": _layernorm32(sd, "ln_final"),
    }
    if full and "text_projection" in sd:
        params["text_projection"] = _np(sd["text_projection"])
    n_layers = cfg.layers - (1 if cfg.penultimate and not full else 0)
    for i in range(n_layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock{i}"] = {
            "ln_1": _layernorm32(sd, f"{p}.ln_1"),
            "ln_2": _layernorm32(sd, f"{p}.ln_2"),
            "in_proj": {
                "kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{p}.attn.in_proj_bias"]),
            },
            "out_proj": _linear(sd, f"{p}.attn.out_proj"),
            "c_fc": _linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return {"params": params}


# ---------------------------------------------------------------------------
# i2v extras: CLIP vision tower + IP projector (LatentVisualDiffusion)
# ---------------------------------------------------------------------------

def convert_clip_vision(sd: StateDict, layers: int = 32,
                        prefix: str = "embedder.model.visual.") -> Dict:
    """OpenCLIP ViT visual tower (condition.py:238-320 embedder)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    params: Dict = {
        "class_embedding": _np(sd["class_embedding"]),
        "positional_embedding": _np(sd["positional_embedding"]),
        "proj": _np(sd["proj"]),
        "patch": {"kernel": _np(sd["conv1.weight"]).transpose(2, 3, 1, 0)},
        "ln_pre": _norm(sd, "ln_pre"),
        "ln_post": _norm(sd, "ln_post"),
    }
    for i in range(layers):
        p = f"transformer.resblocks.{i}"
        params[f"resblock{i}"] = {
            "ln_1": _norm(sd, f"{p}.ln_1"),
            "ln_2": _norm(sd, f"{p}.ln_2"),
            "in_proj": {
                "kernel": _np(sd[f"{p}.attn.in_proj_weight"]).T,
                "bias": _np(sd[f"{p}.attn.in_proj_bias"]),
            },
            "out_proj": _linear(sd, f"{p}.attn.out_proj"),
            "c_fc": _linear(sd, f"{p}.mlp.c_fc"),
            "c_proj": _linear(sd, f"{p}.mlp.c_proj"),
        }
    return {"params": params}


def convert_image_proj(sd: StateDict,
                       prefix: str = "image_proj_model.") -> Dict:
    """ImageProjModel or Resampler weights (ip_resampler.py)."""
    sd = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    if "proj.weight" in sd:  # ImageProjModel
        return {"params": {
            "proj": _linear(sd, "proj"),
            "norm": _norm(sd, "norm"),
        }}
    # Resampler
    params: Dict = {
        "latents": _np(sd["latents"]),
        "proj_in": _linear(sd, "proj_in"),
        "proj_out": _linear(sd, "proj_out"),
        "norm_out": _norm(sd, "norm_out"),
    }
    i = 0
    while f"layers.{i}.0.to_q.weight" in sd:
        p = f"layers.{i}"
        params[f"layer{i}_attn"] = {
            "norm1": _norm(sd, f"{p}.0.norm1"),
            "norm2": _norm(sd, f"{p}.0.norm2"),
            "to_q": _linear(sd, f"{p}.0.to_q", bias=False),
            "to_kv": _linear(sd, f"{p}.0.to_kv", bias=False),
            "to_out": _linear(sd, f"{p}.0.to_out", bias=False),
        }
        params[f"layer{i}_ff_norm"] = _norm(sd, f"{p}.1.0")
        params[f"layer{i}_ff_in"] = _linear(sd, f"{p}.1.1", bias=False)
        params[f"layer{i}_ff_out"] = _linear(sd, f"{p}.1.3", bias=False)
        i += 1
    return {"params": params}


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .ckpt into numpy, handling the DeepSpeed wrapper format
    (funcs.py:487-503: 'module' dict with 16-char key prefix) and the plain
    'state_dict' wrapper."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "module" in ckpt:
        sd = {k[16:]: v for k, v in ckpt["module"].items()}
    elif isinstance(ckpt, dict) and "state_dict" in ckpt:
        sd = ckpt["state_dict"]
    else:
        sd = ckpt
    return {k: _np(v) for k, v in sd.items()}


def extract_ema_weights(sd: StateDict, model_prefix: str = "model.",
                        ema_prefix: str = "model_ema.") -> StateDict:
    """Rebuild dotted `model.*` keys from LitEma's flattened shadow buffers.

    The reference's LitEma registers one shadow buffer per trainable param
    with the dots stripped from the name (lvdm/ema.py:16-21: `s_name =
    name.replace('.','')`), so a use_ema checkpoint stores e.g.
    `model_ema.diffusion_modelout2weight` next to
    `model.diffusion_model.out.2.weight`. Inference wants the EMA weights
    (ddpm3d.py ema_scope), so recover the dotted names by matching each
    shadow key against the dot-stripped live-model keys and return a
    state dict of `model.*`-keyed EMA values ready for convert_unet.
    """
    stripped: Dict[str, str] = {}
    for k in sd:
        if not k.startswith(model_prefix):
            continue
        dotted = k[len(model_prefix):]
        s = dotted.replace(".", "")
        if s in stripped:
            raise ValueError(
                f"ambiguous EMA name: {dotted!r} and {stripped[s]!r} both "
                f"strip to {s!r}")
        stripped[s] = dotted
    out: StateDict = {}
    for k, v in sd.items():
        if not k.startswith(ema_prefix):
            continue
        s = k[len(ema_prefix):]
        if s in ("decay", "num_updates"):
            continue
        if s not in stripped:
            raise KeyError(f"EMA shadow {k!r} has no matching model param")
        out[model_prefix + stripped[s]] = v
    return out


def convert_checkpoint(path: str, unet_cfg: UNetConfig, vae_cfg: VAEConfig,
                       clip_cfg: CLIPTextConfig, use_ema: bool = False):
    """One-call conversion of a VideoCrafter2 model.ckpt → three Flax trees.

    use_ema overlays the LitEma shadow weights (checkpoints trained with
    conditioning_key use_ema; the shipped inference config has use_ema
    false, so default off)."""
    sd = load_torch_state_dict(path)
    if use_ema:
        sd = {**sd, **extract_ema_weights(sd)}
    return (
        convert_unet(sd, unet_cfg),
        convert_vae(sd, vae_cfg),
        convert_clip(sd, clip_cfg),
    )
