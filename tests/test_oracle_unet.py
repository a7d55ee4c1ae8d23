"""Activation parity: the reference's ACTUAL `UNetModel` (PyTorch, CPU) vs
`UNet3D` (Flax) through `models/convert.py`.

This is the converter's real oracle: the reference module is instantiated at
a shrunken config (ref: lvdm/modules/networks/openaimodel3d.py:279-578), every
parameter (including the zero-initialized last layers) is randomized, its
`state_dict()` is run through `convert_unet`, and the two towers must agree
to fp32 precision on the same inputs — so any key-name, Sequential-index, or
kernel-layout mistake in the converter fails loudly here rather than
silently corrupting a real-checkpoint load.

Covered branches: uniform timesteps, the FIFO per-frame-timestep path
(openaimodel3d.py:535-549), fps_cond, addition_attention, relative-position
+ causal temporal attention, dual text+image cross-attention
(attention.py:82-124), and tempspatial_aware temporal convs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moca_tpu.models.convert import convert_unet
from moca_tpu.models.unet3d import UNetConfig, UNet3D

from tests.oracle import (
    assert_close, load_reference, randomize_module, state_dict_numpy, to_torch,
)

# shrunken but structurally faithful: two levels, attention at both ds,
# GroupNorm(32)-compatible widths, addition_attention + fps_cond on.
BASE = dict(
    in_channels=4, out_channels=4, model_channels=64, num_res_blocks=1,
    attention_resolutions=(1, 2), channel_mult=(1, 2), num_head_channels=32,
    transformer_depth=1, temporal_transformer_depth=1, context_dim=64,
    use_linear=True, temporal_conv=True, tempspatial_aware=False,
    temporal_attention=True, temporal_selfatt_only=True,
    use_relative_position=False, use_causal_attention=False,
    temporal_length=4, addition_attention=True, use_image_attention=False,
    fps_cond=True, dropout=0.0,
)


def build_pair(seed=0, **overrides):
    """(torch UNetModel, flax UNet3D, converted params) at BASE+overrides."""
    ref = load_reference()
    kw = dict(BASE, **overrides)
    t_unet = ref.openaimodel3d.UNetModel(
        in_channels=kw["in_channels"],
        model_channels=kw["model_channels"],
        out_channels=kw["out_channels"],
        num_res_blocks=kw["num_res_blocks"],
        attention_resolutions=list(kw["attention_resolutions"]),
        dropout=kw["dropout"],
        channel_mult=list(kw["channel_mult"]),
        dims=2,
        context_dim=kw["context_dim"],
        num_head_channels=kw["num_head_channels"],
        transformer_depth=kw["transformer_depth"],
        use_linear=kw["use_linear"],
        temporal_conv=kw["temporal_conv"],
        tempspatial_aware=kw["tempspatial_aware"],
        temporal_attention=kw["temporal_attention"],
        temporal_selfatt_only=kw["temporal_selfatt_only"],
        use_relative_position=kw["use_relative_position"],
        use_causal_attention=kw["use_causal_attention"],
        temporal_length=kw["temporal_length"],
        addition_attention=kw["addition_attention"],
        use_image_attention=kw["use_image_attention"],
        temporal_transformer_depth=kw["temporal_transformer_depth"],
        fps_cond=kw["fps_cond"],
    )
    randomize_module(t_unet, seed=seed)
    cfg = UNetConfig(**kw)
    params = convert_unet(state_dict_numpy(t_unet), cfg, prefix="")
    return t_unet, UNet3D(cfg), params


def run_pair(t_unet, f_unet, params, x_bthwc, timesteps_torch, t_frames,
             context, fps=16):
    ref = load_reference()
    torch = ref.torch
    x_t = to_torch(np.moveaxis(x_bthwc, -1, 1))  # [B,T,H,W,C] → [B,C,T,H,W]
    with torch.no_grad():
        out_t = t_unet(x_t, to_torch(timesteps_torch),
                       context=to_torch(context), fps=fps)
    out_f = f_unet.apply(params, jnp.asarray(x_bthwc),
                         jnp.asarray(t_frames), jnp.asarray(context), fps=fps)
    return out_f, out_t.movedim(1, -1)  # torch back to [B,T,H,W,C]


def make_inputs(b=2, t=4, h=8, w=8, c=4, L=7, d=64, seed=1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, t, h, w, c)).astype(np.float32)
    ctx = rng.standard_normal((b, L, d)).astype(np.float32)
    return x, ctx


def test_unet_parity_uniform_timesteps():
    t_unet, f_unet, params = build_pair()
    x, ctx = make_inputs()
    ts = np.array([100.0, 500.0], np.float32)          # [B] uniform
    t_frames = np.broadcast_to(ts[:, None], (2, 4))    # [B,T] broadcast rows
    out_f, out_t = run_pair(t_unet, f_unet, params, x, ts, t_frames, ctx)
    assert_close(out_f, out_t, atol=1e-4, label="uniform-t forward")


def test_unet_parity_fifo_per_frame_timesteps():
    """The diagonal-denoise branch: batch 1, one timestep per frame
    (openaimodel3d.py:535 `is_fifo`, :548-549 skips repeat_interleave)."""
    t_unet, f_unet, params = build_pair()
    x, ctx = make_inputs(b=1)
    ts = np.array([50.0, 300.0, 650.0, 900.0], np.float32)  # [T]
    out_f, out_t = run_pair(t_unet, f_unet, params, x, ts, ts[None], ctx)
    assert_close(out_f, out_t, atol=1e-4, label="fifo per-frame-t forward")


def test_unet_parity_fps_conditioning():
    """fps_cond adds a second embedding tower (openaimodel3d.py:539-543);
    different fps values must produce reference-identical different outputs."""
    t_unet, f_unet, params = build_pair()
    x, ctx = make_inputs()
    ts = np.array([200.0, 200.0], np.float32)
    tf = np.broadcast_to(ts[:, None], (2, 4))
    out8_f, out8_t = run_pair(t_unet, f_unet, params, x, ts, tf, ctx, fps=8)
    out24_f, out24_t = run_pair(t_unet, f_unet, params, x, ts, tf, ctx, fps=24)
    assert_close(out8_f, out8_t, atol=1e-4, label="fps=8")
    assert_close(out24_f, out24_t, atol=1e-4, label="fps=24")
    assert np.abs(np.asarray(out8_f) - np.asarray(out24_f)).max() > 1e-6


def test_unet_parity_relative_position_causal():
    """Temporal attention with learned rel-pos bias + causal mask
    (attention.py:21-40,94-113,309-346)."""
    t_unet, f_unet, params = build_pair(
        seed=2, use_relative_position=True, use_causal_attention=True)
    x, ctx = make_inputs(seed=3)
    ts = np.array([150.0, 700.0], np.float32)
    tf = np.broadcast_to(ts[:, None], (2, 4))
    out_f, out_t = run_pair(t_unet, f_unet, params, x, ts, tf, ctx)
    assert_close(out_f, out_t, atol=1e-4, label="relpos+causal forward")


def test_unet_parity_image_cross_attention():
    """Dual text+image context: tokens past 77 route through to_k_ip/to_v_ip
    (attention.py:82-87,116-124) — the i2v U-Net branch."""
    t_unet, f_unet, params = build_pair(seed=4, use_image_attention=True)
    x, ctx = make_inputs(L=77 + 8, seed=5)
    ts = np.array([250.0, 800.0], np.float32)
    tf = np.broadcast_to(ts[:, None], (2, 4))
    out_f, out_t = run_pair(t_unet, f_unet, params, x, ts, tf, ctx)
    assert_close(out_f, out_t, atol=1e-4, label="img-cross forward")


def test_unet_parity_tempspatial_aware():
    """tempspatial_aware widens conv1/conv2 of the temporal conv block to
    (3,3,3) while conv3/conv4 stay (3,1,1) (openaimodel3d.py:249-264)."""
    t_unet, f_unet, params = build_pair(seed=6, tempspatial_aware=True)
    x, ctx = make_inputs(seed=7)
    ts = np.array([400.0, 60.0], np.float32)
    tf = np.broadcast_to(ts[:, None], (2, 4))
    out_f, out_t = run_pair(t_unet, f_unet, params, x, ts, tf, ctx)
    assert_close(out_f, out_t, atol=1e-4, label="tempspatial_aware forward")


def test_converted_tree_matches_flax_init_exactly():
    """The converted tree and a flax-init tree must have identical key paths
    and leaf shapes — catches silently-dropped or extra converter keys."""
    import jax

    t_unet, f_unet, params = build_pair()
    x, ctx = make_inputs(b=1)
    init = f_unet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                       jnp.zeros((1, 4), jnp.int32), jnp.asarray(ctx), fps=16)

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(v)
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    pi, pc = paths(init), paths(params)
    assert pi == pc, (
        f"missing from converter: {sorted(set(pi) - set(pc))[:10]}; "
        f"extra in converter: {sorted(set(pc) - set(pi))[:10]}")


def test_converter_consumes_every_reference_weight():
    """Every tensor in the reference state_dict must land in the converted
    tree (guards against silently ignored weights)."""
    t_unet, f_unet, params = build_pair()
    sd = state_dict_numpy(t_unet)
    n_ref = len(sd)
    import jax

    n_conv = len(jax.tree_util.tree_leaves(params))
    assert n_conv == n_ref, f"reference has {n_ref} tensors, converter emitted {n_conv}"
