"""Pallas TPU flash attention for the U-Net's spatial attention.

Replaces the reference's xformers `memory_efficient_attention` CUDA path
(lvdm/modules/attention.py:129-184) with a TPU-native fused kernel:
QK^T, online softmax (fp32 running max / denominator), and PV accumulate
never leave VMEM — no [Sq, Sk] logits tensor in HBM.

Targets the hot shapes of VideoCrafter2 at 512×320:
  spatial self-attn: Sq = Sk = h·w in {2560, 640, 160}, heads {5,10,20}, d 64.
Temporal (S=16) and text-cross (Sk=77) attention are served by the XLA path
in ops.attention — tiny sequences don't benefit from a custom kernel.

Layout: q,k,v [B, S, H, D]; heads are folded into the Pallas grid via
BlockSpec index maps, so no host-visible transpose is materialized.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128  # stat scratch lane width


def _pick_block(size: int, candidates=(512, 256, 128, 64, 32, 16, 8)) -> int:
    for c in candidates:
        if size % c == 0 and c <= size:
            return c
    return size


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, scale, nkv):
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [bq, d]
    k = k_ref[0, 0]  # [bkv, d]
    v = v_ref[0, 0]  # [bkv, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    s = s * scale  # [bq, bkv]

    m_prev = m_ref[:, :1]  # [bq, 1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp(s - m_new)  # [bq, bkv] fp32
    alpha = jnp.exp(m_prev - m_new)  # [bq, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nkv - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=())
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention on [B, S, H, D]; softmax in fp32. No bias/mask.

    Internally heads-major [B, H, S, D] so every Pallas block keeps (seq, d)
    as its trailing dims (TPU tiling wants the last two block dims to be
    8/128-aligned or full); XLA usually fuses the transposes into the
    surrounding projections.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = _pick_block(sq)
    bkv = _pick_block(sk)
    nq, nkv = sq // bq, sk // bkv
    scale = d**-0.5

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    grid = (b, h, nq, nkv)
    kernel = functools.partial(_fa_kernel, scale=scale, nkv=nkv)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
            pl.BlockSpec((1, 1, bkv, d), lambda b_, h_, i, j: (b_, h_, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0)),
        scratch_shapes=[
            pltpu.VMEM((bq, _LANES), jnp.float32),  # running max
            pltpu.VMEM((bq, _LANES), jnp.float32),  # running denom
            pltpu.VMEM((bq, d), jnp.float32),  # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qt, kt, vt)
    return out.transpose(0, 2, 1, 3)
