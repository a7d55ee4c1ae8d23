"""Converter layout parity vs PyTorch ops (CPU torch is a test-only dep).

Validates the tensor-layout transforms in models/convert.py against real
torch layers: Linear, Conv2d (incl. stride-2 and asymmetric pad), Conv3d,
GroupNorm, LayerNorm, and a full attention block — the building blocks whose
conversion fidelity determines checkpoint parity (SURVEY §7 hard parts).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

from moca_tpu.ops.norms import GroupNorm32  # noqa: E402


def _t2n(t):
    return t.detach().numpy()


@torch.no_grad()
def test_linear_parity():
    torch.manual_seed(0)
    lin = torch.nn.Linear(8, 12)
    x = torch.randn(3, 8)
    want = _t2n(lin(x))
    dense = nn.Dense(12)
    params = {"params": {"kernel": _t2n(lin.weight).T, "bias": _t2n(lin.bias)}}
    got = dense.apply(params, jnp.asarray(_t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@torch.no_grad()
def test_conv2d_parity():
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(3, 5, 3, padding=1)
    x = torch.randn(2, 3, 8, 8)
    want = _t2n(conv(x)).transpose(0, 2, 3, 1)  # NCHW→NHWC
    fconv = nn.Conv(5, (3, 3))
    params = {"params": {
        "kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
        "bias": _t2n(conv.bias)}}
    got = fconv.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@torch.no_grad()
def test_conv2d_stride2_parity():
    """U-Net Downsample: stride-2, pad 1 (openaimodel3d.py:66-69)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=1)
    x = torch.randn(1, 4, 8, 8)
    want = _t2n(conv(x)).transpose(0, 2, 3, 1)
    # explicit (1,1) padding — flax SAME pads (0,1) for stride 2 on even
    # dims, misaligning windows vs torch (models/unet3d.Downsample matches)
    fconv = nn.Conv(4, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
    params = {"params": {
        "kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
        "bias": _t2n(conv.bias)}}
    got = fconv.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@torch.no_grad()
def test_vae_downsample_asymmetric_pad_parity():
    """VAE Downsample pads (0,1,0,1) then VALID stride-2
    (ae_modules.py:100-110)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv2d(4, 4, 3, stride=2, padding=0)
    x = torch.randn(1, 4, 9, 9)
    xp = torch.nn.functional.pad(x, (0, 1, 0, 1))
    want = _t2n(conv(xp)).transpose(0, 2, 3, 1)
    xj = jnp.asarray(_t2n(x).transpose(0, 2, 3, 1))
    xj = jnp.pad(xj, ((0, 0), (0, 1), (0, 1), (0, 0)))
    fconv = nn.Conv(4, (3, 3), strides=(2, 2), padding="VALID")
    params = {"params": {
        "kernel": _t2n(conv.weight).transpose(2, 3, 1, 0),
        "bias": _t2n(conv.bias)}}
    got = fconv.apply(params, xj)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@torch.no_grad()
def test_conv3d_temporal_parity():
    """TemporalConvBlock kernel (3,1,1), pad (1,0,0)
    (openaimodel3d.py:248-254)."""
    torch.manual_seed(0)
    conv = torch.nn.Conv3d(4, 6, (3, 1, 1), padding=(1, 0, 0))
    x = torch.randn(2, 4, 5, 3, 3)  # N,C,T,H,W
    want = _t2n(conv(x)).transpose(0, 2, 3, 4, 1)  # →N,T,H,W,C
    fconv = nn.Conv(6, (3, 1, 1))
    params = {"params": {
        "kernel": _t2n(conv.weight).transpose(2, 3, 4, 1, 0),
        "bias": _t2n(conv.bias)}}
    got = fconv.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 4, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@torch.no_grad()
def test_groupnorm_parity():
    torch.manual_seed(0)
    gn = torch.nn.GroupNorm(4, 8)
    gn.weight.copy_(torch.randn(8))
    gn.bias.copy_(torch.randn(8))
    x = torch.randn(2, 8, 4, 4)
    want = _t2n(gn(x)).transpose(0, 2, 3, 1)
    m = GroupNorm32(4)
    params = {"params": {"GroupNorm_0": {
        "scale": _t2n(gn.weight), "bias": _t2n(gn.bias)}}}
    got = m.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


@torch.no_grad()
def test_cross_attention_block_parity():
    """Full CrossAttention (self-attn path) vs a literal torch translation of
    attention.py:43-127 with converted weights."""
    from moca_tpu.models.unet3d import CrossAttention

    torch.manual_seed(0)
    dim, heads, dim_head = 16, 2, 8
    inner = heads * dim_head
    to_q = torch.nn.Linear(dim, inner, bias=False)
    to_k = torch.nn.Linear(dim, inner, bias=False)
    to_v = torch.nn.Linear(dim, inner, bias=False)
    to_out = torch.nn.Linear(inner, dim)
    x = torch.randn(2, 5, dim)

    # torch forward (attention.py:76-127, no rel-pos, no mask)
    q, k, v = to_q(x), to_k(x), to_v(x)
    B, S = 2, 5
    qh = q.reshape(B, S, heads, dim_head).permute(0, 2, 1, 3)
    kh = k.reshape(B, S, heads, dim_head).permute(0, 2, 1, 3)
    vh = v.reshape(B, S, heads, dim_head).permute(0, 2, 1, 3)
    sim = torch.einsum("bhid,bhjd->bhij", qh, kh) * dim_head**-0.5
    out = torch.einsum("bhij,bhjd->bhid", sim.softmax(-1), vh)
    out = out.permute(0, 2, 1, 3).reshape(B, S, inner)
    want = _t2n(to_out(out))

    attn = CrossAttention(heads=heads, dim_head=dim_head)
    params = {"params": {
        "to_q": {"kernel": _t2n(to_q.weight).T},
        "to_k": {"kernel": _t2n(to_k.weight).T},
        "to_v": {"kernel": _t2n(to_v.weight).T},
        "to_out": {"kernel": _t2n(to_out.weight).T, "bias": _t2n(to_out.bias)},
    }}
    got = attn.apply(params, jnp.asarray(_t2n(x)))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)


@torch.no_grad()
def test_timestep_embedding_parity():
    """cos-first ordering matches the reference (utils_diffusion.py:17-25)."""
    from moca_tpu.schedule import timestep_embedding
    import math as m

    t = torch.tensor([0.0, 17.0, 999.0])
    dim, mp = 32, 10000
    half = dim // 2
    freqs = torch.exp(-m.log(mp) * torch.arange(half, dtype=torch.float32) / half)
    args = t[:, None] * freqs[None]
    want = _t2n(torch.cat([torch.cos(args), torch.sin(args)], dim=-1))
    got = timestep_embedding(jnp.asarray(_t2n(t)), dim)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
