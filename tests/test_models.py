"""Model-stack shape and semantics tests (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig, UNet3D, unet_plan
from moca_tpu.models.vae import AutoencoderKL, VAEConfig


def _randomize_out_conv(params):
    """The reference zero-initializes every block's last layer (zero_module,
    openaimodel3d.py:177,266,531; attention proj_out) so a fresh model is an
    identity function — output-sensitivity tests need ALL zero kernels
    replaced with random values."""
    return randomize_zero_params(params)


def randomize_zero_params(params, scale=0.05, seed=99):
    leaves, treedef = jax.tree.flatten(params)
    key = jax.random.PRNGKey(seed)
    out = []
    for i, leaf in enumerate(leaves):
        if leaf.ndim >= 1 and not np.any(np.asarray(leaf)):
            out.append(jax.random.normal(
                jax.random.fold_in(key, i), leaf.shape, leaf.dtype) * scale)
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def test_unet_plan_full_config_counts():
    """Shipped config: 12 input blocks, 4 middle layers, 12 output blocks
    (openaimodel3d.py constructor walk)."""
    plan_in, plan_mid, plan_out = unet_plan(UNetConfig())
    assert len(plan_in) == 12   # 1 conv_in + 4 levels × 2 res + 3 downsample
    assert len(plan_out) == 12  # 4 levels × 3
    assert [s["kind"] for s in plan_mid] == ["res", "spatial", "temporal", "res"]
    # attention at ds ∈ {1,2,4} → levels 0,1,2 have transformers, level 3 not
    kinds_lvl3 = [s["kind"] for s in plan_in[7]]
    assert kinds_lvl3 == ["res", "spatial", "temporal"]
    assert [s["kind"] for s in plan_in[10]] == ["res"]
    # head counts: ch/64
    assert plan_in[1][1]["heads"] == 5
    assert plan_mid[1]["heads"] == 20


def test_unet_per_frame_timestep_alignment():
    """With temporal layers off, frames are independent: perturbing frame
    j's timestep must change only frame j's output — proves the [B,T]
    embedding path lines up with the (B·T) flattening."""
    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1,), attention_resolutions=(),
                     num_res_blocks=1, temporal_conv=False,
                     temporal_attention=False, addition_attention=False,
                     temporal_length=4)
    m = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    ctx = jnp.zeros((1, 7, 16))
    ts_a = jnp.full((1, 4), 100, jnp.int32)
    ts_b = ts_a.at[0, 2].set(900)
    params = m.init(jax.random.PRNGKey(1), x, ts_a, ctx, fps=16)
    params = _randomize_out_conv(params)
    ya = m.apply(params, x, ts_a, ctx, fps=16)
    yb = m.apply(params, x, ts_b, ctx, fps=16)
    diff = np.abs(np.asarray(ya - yb)).sum(axis=(0, 2, 3, 4))
    assert diff[2] > 1e-7           # perturbed frame changed (magnitude is
    # small: t reaches the output only through the rescaled zero-init layers)
    np.testing.assert_allclose(diff[[0, 1, 3]], 0.0, atol=1e-5)


def test_unet_uniform_equals_broadcast_row():
    """Uniform sampling passes a broadcast [B,T] row — same trace as FIFO
    (no is_fifo shape-sniffing, unlike openaimodel3d.py:535)."""
    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1, 2), attention_resolutions=(1, 2),
                     num_res_blocks=1, temporal_length=4)
    m = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 16))
    ts = jnp.full((1, 4), 500, jnp.int32)
    params = _randomize_out_conv(m.init(jax.random.PRNGKey(1), x, ts, ctx,
                                        fps=16))
    y1 = m.apply(params, x, ts, ctx, fps=16)
    y2 = m.apply(params, x, jnp.broadcast_to(jnp.int32(500), (1, 4)), ctx, fps=16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
    assert y1.shape == x.shape


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(ch=32, ch_mult=(1, 2), num_res_blocks=1, resolution=32)
    m = AutoencoderKL(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    params = m.init(jax.random.PRNGKey(1), x)
    mean, logvar = m.apply(params, x, method=m.encode_moments)
    assert mean.shape == (2, 16, 16, 4)  # 2 levels → one 2× downsample
    z = m.apply(params, x, rng=jax.random.PRNGKey(2), sample=True,
                method=m.encode)
    recon = m.apply(params, z, method=m.decode)
    assert recon.shape == x.shape
    assert (np.asarray(logvar) <= 20).all() and (np.asarray(logvar) >= -30).all()


def test_clip_text_shapes_and_penultimate():
    cfg = CLIPTextConfig(width=16, heads=2, layers=3, penultimate=True)
    m = CLIPTextEncoder(cfg)
    toks = jnp.asarray(HashTokenizer()(["a cat", "a dog on a horse"]))
    params = m.init(jax.random.PRNGKey(0), toks)
    out = m.apply(params, toks)
    assert out.shape == (2, 77, 16)
    # penultimate drops exactly one resblock
    names = [k for k in params["params"] if k.startswith("resblock")]
    assert len(names) == 2


def test_clip_causal_mask_effect():
    """Causality: token t's features must not depend on tokens > t."""
    cfg = CLIPTextConfig(width=16, heads=2, layers=2, penultimate=False)
    m = CLIPTextEncoder(cfg)
    t1 = jnp.zeros((1, 77), jnp.int32).at[0, :5].set(
        jnp.asarray([49406, 10, 20, 30, 49407]))
    t2 = t1.at[0, 50].set(99)  # change a later token
    params = m.init(jax.random.PRNGKey(0), t1)
    o1 = m.apply(params, t1)
    o2 = m.apply(params, t2)
    np.testing.assert_allclose(np.asarray(o1[:, :5]), np.asarray(o2[:, :5]),
                               atol=1e-5)
    assert not np.allclose(np.asarray(o1[:, 50]), np.asarray(o2[:, 50]))
