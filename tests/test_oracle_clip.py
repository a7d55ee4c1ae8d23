"""Numeric oracles for the CLIP text + vision towers.

open_clip (which the reference's `FrozenOpenCLIPEmbedder` /
`FrozenOpenCLIPImageEmbedderV2` wrap, ref: lvdm/modules/encoders/
condition.py:174-235,298-375) is absent in this image, so the oracle is a
plain-torch replica of the public OpenCLIP architecture
(tests/torch_openclip.py) with open_clip state-dict key names: randomize →
convert through `convert_clip` / `convert_clip_vision` → assert fp32
activation parity, exactly like test_oracle_unet does for the U-Net.

These pin down the silent-quality-bug traps the round-2 verdict called out:
erf-gelu vs quick-gelu, the causal-mask layout, penultimate-layer
truncation semantics, ln_final placement, EOT-argmax pooling, the class/
positional embedding layout of the vision tower, and the V2 tokens path
(no ln_post/proj).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from moca_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from moca_tpu.models.clip_vision import (
    _CLIP_MEAN, _CLIP_STD, CLIPVisionConfig, CLIPVisionEncoder,
)
from moca_tpu.models.convert import convert_clip, convert_clip_vision

from tests.oracle import assert_close, randomize_module, state_dict_numpy
from tests.torch_openclip import TextTower, VisionTower

VOCAB, WIDTH, HEADS, LAYERS, CTX = 100, 64, 4, 3, 10


def _text_pair(seed=0):
    t_mod = randomize_module(
        TextTower(VOCAB, WIDTH, HEADS, LAYERS, CTX), seed=seed)
    cfg = CLIPTextConfig(vocab_size=VOCAB, width=WIDTH, heads=HEADS,
                         layers=LAYERS, context_length=CTX)
    return t_mod, cfg


def _tokens(seed=1):
    rng = np.random.default_rng(seed)
    toks = rng.integers(1, VOCAB - 1, (3, CTX))
    toks[:, 0] = VOCAB - 1  # a unique argmax per row (EOT pooling is argmax)
    return toks.astype(np.int32)


def test_clip_text_penultimate_parity():
    """Conditioning path: stop one resblock early, then ln_final
    (condition.py:199-231, layer='penultimate')."""
    t_mod, cfg = _text_pair(seed=30)
    params = convert_clip(state_dict_numpy(t_mod), cfg, prefix="")
    toks = _tokens()
    with torch.no_grad():
        out_t = t_mod.encode_features(torch.from_numpy(toks.astype(np.int64)),
                                      layer_idx=1)
    out_f = CLIPTextEncoder(cfg).apply(params, jnp.asarray(toks))
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_text penult")


def test_clip_text_last_layer_parity():
    """layer='last' (layer_idx=0): the full tower before ln_final-only
    truncation — catches an off-by-one in the penultimate logic."""
    t_mod, _ = _text_pair(seed=31)
    cfg = CLIPTextConfig(vocab_size=VOCAB, width=WIDTH, heads=HEADS,
                         layers=LAYERS, context_length=CTX, penultimate=False)
    params = convert_clip(state_dict_numpy(t_mod), cfg, prefix="")
    toks = _tokens(seed=2)
    with torch.no_grad():
        out_t = t_mod.encode_features(torch.from_numpy(toks.astype(np.int64)),
                                      layer_idx=0)
    out_f = CLIPTextEncoder(cfg).apply(params, jnp.asarray(toks))
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_text last")


def test_clip_text_embed_parity():
    """Pooled text EMBEDDING (CASS/relCASS metric path): full tower +
    ln_final + EOT-argmax pool @ text_projection, via convert_clip
    full=True."""
    t_mod, cfg = _text_pair(seed=32)
    params = convert_clip(state_dict_numpy(t_mod), cfg, prefix="", full=True)
    toks = _tokens(seed=3)
    with torch.no_grad():
        out_t = t_mod.encode_pooled(torch.from_numpy(toks.astype(np.int64)))
    out_f = CLIPTextEncoder(cfg).apply(params, jnp.asarray(toks),
                                       output="embed")
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_text embed")


def test_clip_text_causal_mask_is_load_bearing():
    """Sanity against a vacuous oracle: permuting FUTURE tokens must leave
    earlier positions unchanged (causal mask), and the flax tower must show
    the same invariance."""
    t_mod, cfg = _text_pair(seed=33)
    params = convert_clip(state_dict_numpy(t_mod), cfg, prefix="")
    toks = _tokens(seed=4)
    toks2 = toks.copy()
    toks2[:, -2:] = toks2[:, -2:][:, ::-1]  # swap the last two tokens
    enc = CLIPTextEncoder(cfg)
    a = np.asarray(enc.apply(params, jnp.asarray(toks)))
    b = np.asarray(enc.apply(params, jnp.asarray(toks2)))
    np.testing.assert_allclose(a[:, :-2], b[:, :-2], atol=1e-6)
    assert np.abs(a[:, -2:] - b[:, -2:]).max() > 1e-6  # mask not all -inf


def _vision_pair(image_size=28, seed=40):
    t_mod = randomize_module(
        VisionTower(image_size=image_size, patch_size=14, width=48,
                    heads=4, layers=2, output_dim=32), seed=seed)
    cfg = CLIPVisionConfig(image_size=image_size, patch_size=14, width=48,
                           heads=4, layers=2, output_dim=32)
    return t_mod, cfg


def _vision_inputs(image_size=28, seed=5):
    """flax takes raw [-1,1] NHWC (preprocess is inside the encoder);
    torch replica takes the already-CLIP-normalized NCHW tensor. At
    in_size == 224-equivalent (in == out with align_corners=True) the
    bicubic resize is the identity, so the preprocess reduces to
    (x+1)/2 → mean/std — applied here for the torch side."""
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (2, image_size, image_size, 3)).astype(np.float32)
    pre = ((x + 1) / 2 - np.asarray(_CLIP_MEAN)) / np.asarray(_CLIP_STD)
    return x, torch.from_numpy(pre.transpose(0, 3, 1, 2))


def test_clip_vision_tokens_parity():
    """V2 tokens path (Resampler input): patch tokens straight off the
    transformer, no ln_post/proj (condition.py:343-375)."""
    t_mod, cfg = _vision_pair(seed=41)
    params = convert_clip_vision(state_dict_numpy(t_mod), layers=cfg.layers,
                                 prefix="")
    x, x_t = _vision_inputs()
    with torch.no_grad():
        out_t = t_mod.forward_tokens(x_t)
    out_f = CLIPVisionEncoder(cfg).apply(params, jnp.asarray(x),
                                         output="tokens")
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_vision tok")


def test_clip_vision_pooled_parity():
    """V1 pooled path (ImageProjModel input): class token → ln_post →
    proj (condition.py:288-292)."""
    t_mod, cfg = _vision_pair(seed=42)
    params = convert_clip_vision(state_dict_numpy(t_mod), layers=cfg.layers,
                                 prefix="")
    x, x_t = _vision_inputs(seed=6)
    with torch.no_grad():
        out_t = t_mod.forward_pooled(x_t)
    out_f = CLIPVisionEncoder(cfg).apply(params, jnp.asarray(x),
                                         output="pooled")
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_vision pool")


def test_clip_vision_multi_patch_grid():
    """Grid > 1 (42² → 3×3 patches + class = 10 tokens): positional
    embedding / patch flattening order parity."""
    t_mod, cfg = _vision_pair(image_size=42, seed=43)
    params = convert_clip_vision(state_dict_numpy(t_mod), layers=cfg.layers,
                                 prefix="")
    x, x_t = _vision_inputs(image_size=42, seed=7)
    with torch.no_grad():
        out_t = t_mod.forward_tokens(x_t)
    out_f = CLIPVisionEncoder(cfg).apply(params, jnp.asarray(x),
                                         output="tokens")
    assert out_f.shape == (2, 10, 48)
    assert_close(out_f, out_t, atol=1e-5, rtol=1e-4, label="clip_vision 3x3")


def test_converted_text_tree_matches_flax_init():
    t_mod, cfg = _text_pair(seed=34)
    params = convert_clip(state_dict_numpy(t_mod), cfg, prefix="")
    init = CLIPTextEncoder(cfg).init(
        jax.random.PRNGKey(0), jnp.zeros((1, CTX), jnp.int32))

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(v)
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    assert paths(init) == paths(params)
