"""Attention dispatch: Pallas TPU flash kernel with an XLA fallback.

Covers the two hot shapes of the VideoCrafter U-Net
(ref: lvdm/modules/attention.py):
  * spatial self/cross attention — q len = h·w (2560/640/160 at 512×320),
    kv len = q len (self) or 77 (text cross), batch = B·T windows; the
    reference used xformers CUDA kernels here (attention.py:129-184),
  * temporal self attention — q len = T (16), batch = B·H·W; tiny sequence,
    huge batch — XLA fuses this well, a custom kernel buys little.

The public entry is `dot_product_attention(q, k, v, bias=None)` on
[B, S, H, D] tensors. Softmax is always computed in float32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from moca_tpu.ops import flash_attention as _flash


def _xla_attention(q, k, v, bias=None):
    """Reference-path attention, fp32 softmax. q,k,v: [B, S, H, D]."""
    dim_head = q.shape[-1]
    scale = dim_head**-0.5
    # [B, H, Sq, Sk]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
    return out


def _use_pallas(q, k, v, bias) -> bool:
    import os

    if os.environ.get("MOCA_TPU_NO_PALLAS"):  # A/B escape hatch
        return False
    if bias is not None:
        return False
    if jax.default_backend() != "tpu":
        return False
    if q.shape[-1] not in (64, 128):
        return False
    sq, sk = q.shape[1], k.shape[1]
    # Profiled on v5e (FIFO step):
    #  * large self-attention (S=2560) → flash kernel;
    #  * short self-attention (160/640) → batched-rows small-S kernel
    #    (per-(b,h) grids cost 62 ms at S=160);
    #  * text cross-attention (sk=77) stays on XLA — a pallas route was
    #    measured 40 ms/step SLOWER (head-transpose copies outweigh the
    #    avoided fp32 logits at kv=77).
    return sq >= 128 and sk >= 128


def use_packed_tiny(seq_len: int, kv_len: int, bias,
                    channels: int = 0) -> bool:
    """Route tiny self-attention (temporal transformers, S=16) through the
    packed-heads Pallas kernel — avoids XLA's head-major transposes and HBM
    logits (~430 ms/step profiled at the flagship FIFO shape).

    All temporal widths (C ∈ {320, 512, 640, 1280}) validated on v5e with
    rows-per-program scaled to channel width (fixed nb blew the 16MB scoped
    VMEM and crashed the Mosaic compiler at C ≥ 512)."""
    import os

    if os.environ.get("MOCA_TPU_NO_PALLAS"):
        return False
    return (bias is None and jax.default_backend() == "tpu"
            and seq_len == kv_len and seq_len <= 32 and seq_len % 8 == 0
            and 0 < channels <= 1280)


def packed_attention(q, k, v, heads: int):
    """[N, S, H·D] packed-heads attention (see flash_attention.packed_attention)."""
    return _flash.packed_attention(q, k, v, heads)


def use_fused_qkv(seq_len: int, channels: int, heads: int,
                  dim_head: int) -> bool:
    """Route a tiny-S SELF-attention through the fused
    projections+attention+out kernel (flash_attention.fused_qkv_attention).

    Requires inner == channels (square projections), d=64 heads, and either
    C=320 (in-kernel 64-lane slices) or C % 128 == 0. The C=1280 weight set
    (4 × 13.1 MB bf16) only fits under the tuned 64 MiB scoped-VMEM option,
    so it additionally needs the big-VMEM trace gate.

    Default OFF: measured a net LOSS on the product FIFO path (1.865 vs
    1.818 s/frame all-widths, 1.835 C=320-only — docs/PERF.md "fused QKV").
    The custom call's canonical-layout requirement on x costs more than
    the relayouts it saves. Opt in with MOCA_TPU_FA_FUSED_QKV=1 or a
    width allowlist ("320,512")."""
    import os

    if os.environ.get("MOCA_TPU_NO_PALLAS"):
        return False
    sel = os.environ.get("MOCA_TPU_FA_FUSED_QKV", "0")
    if sel in ("0", ""):
        return False
    if sel != "1" and str(channels) not in [t.strip() for t in sel.split(",")]:
        return False  # width allowlist, e.g. "320, 512" (bench sweeps)
    if jax.default_backend() != "tpu":
        return False
    if dim_head != 64 or heads * dim_head != channels:
        return False
    if not (seq_len <= 32 and seq_len % 8 == 0):
        return False
    if channels == 320:
        return True
    if channels % 128 or channels > 1280:
        return False
    from moca_tpu.xla_opts import big_vmem_available

    return channels <= 640 or big_vmem_available()


def fused_qkv_attention(x, wq, wk, wv, wo, bo, heads: int):
    """See flash_attention.fused_qkv_attention."""
    return _flash.fused_qkv_attention(x, wq, wk, wv, wo, bo, heads)


@functools.partial(jax.named_call, name="attention")
def dot_product_attention(q, k, v, bias=None):
    """Multi-head attention on [B, S, H, D] (heads in dim 2).

    Dispatches to the Pallas flash kernel on TPU for large sequences,
    otherwise to a fused XLA path. Both compute softmax in fp32.
    """
    if _use_pallas(q, k, v, bias):
        return _flash.flash_attention(q, k, v)
    return _xla_attention(q, k, v, bias)
