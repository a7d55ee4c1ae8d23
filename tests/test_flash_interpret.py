"""Interpret-mode parity for the Pallas kernel softmax variants.

The real kernels only compile on the TPU (see test_flash_attention.py), but
`pl.pallas_call(..., interpret=True)` runs the same kernel bodies on CPU at
tiny shapes — enough to lock the math of the flag-gated variants
(MOCA_TPU_FA_NOMAX un-normalized exp2 softmax, MOCA_TPU_FA_PACKEDQM=0
k-mask-only head selection) against a numpy reference. Large interpret-mode
shapes hang in this environment; keep shapes tiny.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import moca_tpu.ops.flash_attention as fa


def _ref_attention(q, k, v, scale):
    """numpy softmax(q k^T * scale) v over the last two axes."""
    s = np.einsum("...qd,...kd->...qk", q, k) * scale
    p = np.exp(s - s.max(axis=-1, keepdims=True))
    p = p / p.sum(axis=-1, keepdims=True)
    return np.einsum("...qk,...kd->...qd", p, v)


@pytest.mark.parametrize("nomax", [False, True])
@pytest.mark.parametrize("stat_lanes", [128, 1])
def test_fa_kernel_interpret(nomax, stat_lanes):
    b, h, s, d = 1, 2, 16, 8
    bq, bkv = 8, 8
    nq, nkv = s // bq, s // bkv
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)

    kernel = functools.partial(fa._fa_kernel, scale=scale, nkv=nkv,
                               stat_lanes=stat_lanes, nomax=nomax)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.float32),
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d),
                               lambda b_, h_, i, j: (b_, h_, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((8, stat_lanes) if nomax else (bq, stat_lanes),
                       jnp.float32),
            pltpu.VMEM((bq, stat_lanes), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),
        ],
        interpret=True,
    )(q, k, v)
    ref = _ref_attention(np.asarray(q), np.asarray(k), np.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("nomax", [False, True])
def test_fa_onepass_kernel_interpret(nomax):
    b, h, s, d = 1, 2, 16, 8
    bq = 8
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(kq, (b, h, s, d), jnp.float32)
    k = jax.random.normal(kk, (b, h, s, d), jnp.float32)
    v = jax.random.normal(kv, (b, h, s, d), jnp.float32)
    out = pl.pallas_call(
        functools.partial(fa._fa_onepass_kernel, scale=scale, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.float32),
        grid=(b, h, s // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda b_, h_, i: (b_, h_, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0)),
        interpret=True,
    )(q, k, v)
    ref = _ref_attention(np.asarray(q), np.asarray(k), np.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("nomax", [False, True])
def test_fa_small_kernel_interpret(nomax):
    nb, s, d = 4, 16, 8
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (nb, s, d), jnp.float32)
    k = jax.random.normal(kk, (nb, s, d), jnp.float32)
    v = jax.random.normal(kv, (nb, s, d), jnp.float32)
    out = pl.pallas_call(
        functools.partial(fa._fa_small_kernel, scale=scale, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((nb, s, d), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0)),
        interpret=True,
    )(q, k, v)
    ref = _ref_attention(np.asarray(q), np.asarray(k), np.asarray(v), scale)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("nomax", [False, True])
@pytest.mark.parametrize("hpb", [1, 2])
def test_packed_lane_kernel_interpret(hpb, nomax):
    """Lane-blocked packed kernel: grid axis 1 walks head blocks."""
    nb, s, heads, d = 4, 8, 4, 8
    c = heads * d
    bc = hpb * d
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(3), 3)
    q = jax.random.normal(kq, (nb, s, c), jnp.float32)
    k = jax.random.normal(kk, (nb, s, c), jnp.float32)
    v = jax.random.normal(kv, (nb, s, c), jnp.float32)
    out = pl.pallas_call(
        functools.partial(fa._packed_lane_kernel, scale=scale, hpb=hpb,
                          d=d, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((nb, s, c), jnp.float32),
        grid=(1, c // bc),
        in_specs=[pl.BlockSpec((nb, s, bc), lambda i, j: (i, 0, j))] * 3,
        out_specs=pl.BlockSpec((nb, s, bc), lambda i, j: (i, 0, j)),
        interpret=True,
    )(q, k, v)
    qh = np.asarray(q).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    ref = _ref_attention(qh, kh, vh, scale)  # [nb, heads, s, d]
    ref = ref.transpose(0, 2, 1, 3).reshape(nb, s, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("nomax", [False, True])
def test_packed_slice_kernel_interpret(nomax):
    """In-kernel lane-sliced head separation (the C=320 product path)."""
    nb, s, heads, d = 4, 8, 5, 8
    c = heads * d
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (nb, s, c), jnp.float32)
    k = jax.random.normal(kk, (nb, s, c), jnp.float32)
    v = jax.random.normal(kv, (nb, s, c), jnp.float32)
    out = pl.pallas_call(
        functools.partial(fa._packed_slice_kernel, scale=scale, heads=heads,
                          d=d, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((nb, s, c), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0)),
        interpret=True,
    )(q, k, v)
    qh = np.asarray(q).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    ref = _ref_attention(qh, kh, vh, scale)  # [nb, heads, s, d]
    ref = ref.transpose(0, 2, 1, 3).reshape(nb, s, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize("nomax", [False, True])
@pytest.mark.parametrize("qmask", [True, False])
def test_packed_tiny_kernel_interpret(qmask, nomax):
    nb, s, heads, d = 4, 8, 2, 8
    c = heads * d
    scale = d**-0.5
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, (nb, s, c), jnp.float32)
    k = jax.random.normal(kk, (nb, s, c), jnp.float32)
    v = jax.random.normal(kv, (nb, s, c), jnp.float32)
    out = pl.pallas_call(
        functools.partial(fa._packed_tiny_kernel, scale=scale, heads=heads,
                          d=d, qmask=qmask, nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((nb, s, c), jnp.float32),
        grid=(1,),
        in_specs=[pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0)),
        interpret=True,
    )(q, k, v)
    qh = np.asarray(q).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    kh = np.asarray(k).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    vh = np.asarray(v).reshape(nb, s, heads, d).transpose(0, 2, 1, 3)
    ref = _ref_attention(qh, kh, vh, scale)  # [nb, heads, s, d]
    ref = ref.transpose(0, 2, 1, 3).reshape(nb, s, c)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_choose_flash_blocks():
    """Block-choice policy (r5: whole-S one-shot default under big VMEM)."""
    from moca_tpu.ops.flash_attention import _choose_flash_blocks

    # big VMEM + tile fits 27 MB → whole-S one-shot (the r5 default)
    assert _choose_flash_blocks(2560, 2560, True) == (2560, 2560)
    # plain jit: Mosaic can't fit the big tiles → blocked path
    assert _choose_flash_blocks(2560, 2560, False) == (640, 1280)
    # tile too big for whole-S (5120² = 100 MB) → blocked bq; the 27 MB
    # cap applies ONLY to the proven single-program whole-S case, so the
    # multi-program grid keeps the r3-tested 8 MB full-KV margin
    # (640·5120·4 = 13.1 MB > 8 MB) → blocked kv, the known-good path
    assert _choose_flash_blocks(5120, 5120, True) == (640, 1280)
    # env-pinned blocked bq: same 8 MB rule (13.1 MB > 8 MB) → blocked kv
    assert _choose_flash_blocks(2560, 2560, True, bq_env=1280) == (1280, 1280)
    # env-pinned bq=sq still gets the whole-S full-KV tile
    assert _choose_flash_blocks(2560, 2560, True, bq_env=2560) == (2560, 2560)
    # env-pinned blocked bq whose tile fits 8 MB keeps full-KV
    assert _choose_flash_blocks(2560, 2560, True, bq_env=640) == (640, 2560)
    # non-dividing env overrides are ignored
    assert _choose_flash_blocks(2560, 2560, True, bq_env=700) == (2560, 2560)
    # env-pinned bkv wins over full-KV
    assert _choose_flash_blocks(2560, 2560, True, bkv_env=1280) == (2560, 1280)
