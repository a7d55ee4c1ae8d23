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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128  # stat scratch lane width


def _env_int(name: str, default: int = 0) -> int:
    """Integer env knob; whitespace-tolerant, loud on non-numeric values."""
    raw = os.environ.get(name, "").strip()
    if not raw:
        return default
    try:
        return int(raw)
    except ValueError:
        raise ValueError(f"{name} must be an integer, got {raw!r}") from None


def _big_vmem() -> bool:
    """Trace-time: is the tuned 64 MiB scoped-VMEM compile option in force?

    Kernels pick block shapes at trace time, but the scoped-VMEM budget is a
    per-jit compile option — the tuned_jit wrapper records which one applies
    (xla_opts.big_vmem_available). Under a plain jax.jit (stock 16 MiB) the
    aggressive shapes (full-KV S=2560 blocks, the 8 MB small-S logits cap)
    fail Mosaic compilation, so those choices are gated on this. Declaring
    per-kernel `vmem_limit_bytes` instead measured 17.28 s/frame vs 1.82
    (driver bench) — see xla_opts.py.
    """
    from moca_tpu.xla_opts import big_vmem_available

    return big_vmem_available()


def _pick_block(size: int, candidates=(512, 256, 128, 64, 32, 16, 8)) -> int:
    for c in candidates:
        if size % c == 0 and c <= size:
            return c
    return size


def _softmax_mode() -> str:
    """Softmax variant for the large-S flash paths: safe | nomax | guarded.

    * safe    — classic online softmax with the running-max shift; exact
                for any input.
    * nomax   — un-normalized exp2 (no max shift): ~2 fewer VPU passes over
                the [bq, bkv] logits, but fp32 exp2 overflows past a base-2
                logit of 127 → silent NaN on pathologically sharp heads.
    * guarded (default) — nomax compute + an in-kernel finiteness flag on
                the fp32 output tile AND the softmax denominator (the
                output alone misses denominator-only overflow: every exp
                finite but Σexp=inf → a finite all-zero output); a lax.cond
                re-runs the safe kernel only when flagged. Exact-safe at
                nomax speed: the flags are two cheap reduces per q block, and
                normal attention never triggers the fallback. Rows whose
                max base-2 logit lies in (-126, -120) keep subnormal-level
                precision (≫ bf16 output ulp) without flagging.

    MOCA_TPU_FA_SOFTMAX overrides; MOCA_TPU_FA_NOMAX=1 is the legacy alias
    for the raw nomax mode.
    """
    mode = os.environ.get("MOCA_TPU_FA_SOFTMAX", "").strip().lower()
    if mode in ("safe", "nomax", "guarded"):
        return mode
    if os.environ.get("MOCA_TPU_FA_NOMAX", "0") == "1":
        return "nomax"
    return "guarded"


def _fa_kernel(q_ref, k_ref, v_ref, o_ref, *refs, scale, nkv,
               stat_lanes=_LANES, nomax=False, guard=False):
    if guard:
        f_ref, m_ref, l_ref, acc_ref = refs
    else:
        f_ref, (m_ref, l_ref, acc_ref) = None, refs
    j = pl.program_id(3)

    @pl.when(j == 0)
    def _init():
        if not nomax:
            m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # base-2 softmax with the scale folded into q: exp2(s−m) ≡
    # exp((s−m)/log2e) with the softmax ratio unchanged, and scaling the
    # [bq, d] q block instead of the [bq, bkv] logits does 10× less VPU
    # work (v5e sweep: 61.3 → 48.5 ms together with bkv=1280).
    q = (q_ref[0, 0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)  # [bq, d]
    k = k_ref[0, 0]  # [bkv, d]
    v = v_ref[0, 0]  # [bkv, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, bkv]

    if nomax:
        # un-normalized exp2 softmax: drops the running max, its broadcast
        # subtract, and the acc rescale — ~3 fewer VPU passes over the
        # [bq, bkv] logits per kv block. fp32 exp2 only overflows past a
        # base-2 logit of 127 (natural-log ≈ 88); attention that saturated
        # is already degenerate. Flag-gated: MOCA_TPU_FA_NOMAX=1.
        p = jnp.exp2(s)
        l_ref[:] = l_ref[:] + jnp.broadcast_to(
            jnp.sum(p, axis=1, keepdims=True), l_ref.shape)
        acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(j == nkv - 1)
        def _finalize_nomax():
            l = l_ref[:, :1]
            o32 = acc_ref[:] / l
            o_ref[0, 0] = o32.astype(o_ref.dtype)
            if guard:
                # overflow/underflow hazards: p=inf → acc or l inf → o inf
                # or inf/inf=nan; all-rows-underflow → l=0 → 0/0=nan. The
                # output check alone misses DENOMINATOR-ONLY overflow (every
                # p finite but Σp=inf with |v| small → o = finite/inf = 0,
                # silently wrong), so l's finiteness is flagged explicitly
                # — any p=inf also drives l=inf, so the l check subsumes
                # every overflow path. Two cheap reduces per q block
                # ([bq, d] + [bq, 1]) — ~bkv/d× cheaper than the logits
                # passes the nomax form saves.
                bad = jnp.logical_or(
                    jnp.logical_not(jnp.all(jnp.abs(o32) < jnp.inf)),
                    jnp.logical_not(jnp.all(l < jnp.inf)))
                f_ref[0, 0, 0] = jnp.broadcast_to(
                    bad.astype(jnp.float32), f_ref.shape[-2:])

        return

    m_prev = m_ref[:, :1]  # [bq, 1]
    l_prev = l_ref[:, :1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)

    p = jnp.exp2(s - m_new)  # [bq, bkv] fp32
    alpha = jnp.exp2(m_prev - m_new)  # [bq, 1]
    l_new = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)

    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if stat_lanes == 1:
        # [bq, 1] masked stores — skips the [bq, 128] broadcast writes
        m_ref[:] = m_new
        l_ref[:] = l_new
    else:
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nkv - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:, :1]).astype(o_ref.dtype)


def _fa_onepass_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, nomax=False):
    """Single-pass attention: one program owns a q block and the FULL kv.

    No online-softmax state, no scratch, no kv grid axis — the [bq, Sk]
    fp32 logits live once in VMEM and die there. Only viable when the
    logits tile fits (bq=512 × Sk=2560 → 5.2 MB, needs the 64 MiB
    scoped-VMEM compile option the product ships in xla_opts; the r1
    attempt at bq=bkv=2560 predated it and regressed).
    """
    q = (q_ref[0, 0].astype(jnp.float32)
         * (scale * 1.4426950408889634)).astype(q_ref.dtype)  # [bq, d]
    k = k_ref[0, 0]  # [Sk, d]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [bq, Sk]
    if not nomax:
        s = s - jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def _softmax_rows(logits, nomax):
    """Row softmax over the last axis; optionally without the max shift.

    `nomax` drops the max-reduce and its broadcast subtract (fp32 exp only
    overflows past a natural-log logit of ~88; GroupNorm-bounded attention
    logits sit orders of magnitude below). Flag-gated, default keeps the
    shifted form."""
    if not nomax:
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits)
    return p / jnp.sum(p, axis=-1, keepdims=True)


def _fa_small_kernel(q_ref, k_ref, v_ref, o_ref, f_ref=None, *, scale,
                     nomax=False, guard=False):
    """Batched-rows single-pass attention for short sequences.

    One program handles `nb` independent (batch·head) rows of a full SxS
    attention — amortizing grid overhead that dominates at small S (the
    per-(b,h,q-block,kv-block) grid costs 62 ms at S=160 vs ~5 ms here).

    `guard`: nomax softmax + a finiteness flag on the fp32 output tile
    (see _softmax_mode); the caller re-runs the safe form when flagged.
    """
    q = q_ref[...]  # [nb, S, d]
    k = k_ref[...]
    v = v_ref[...]
    logits = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale  # [nb, S, S]
    if guard:
        # keep the un-divided exp and its row sum visible: the fp32 output
        # check alone misses denominator-only overflow (every exp finite
        # but Σexp=inf → p = finite/inf = 0 → a finite all-zero output);
        # any exp=inf also drives the sum to inf, so flagging the sum
        # subsumes every overflow path, and sum=0 (all-underflow) lands as
        # 0/0=nan in the output check.
        praw = jnp.exp(logits)
        denom = jnp.sum(praw, axis=-1, keepdims=True)
        p = praw / denom
    else:
        p = _softmax_rows(logits, nomax)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)
    if guard:
        bad = jnp.logical_or(
            jnp.logical_not(jnp.all(jnp.abs(out) < jnp.inf)),
            jnp.logical_not(jnp.all(denom < jnp.inf)))
        f_ref[...] = jnp.broadcast_to(bad.astype(jnp.float32), f_ref.shape)


def _small_attention(q, k, v):
    """[B,S,H,D] self-attention for S ≤ ~640 via the batched-rows kernel."""
    b, s, h, d = q.shape
    scale = d**-0.5
    mode = _softmax_mode()
    bh = b * h

    def fold(t):
        return t.transpose(0, 2, 1, 3).reshape(bh, s, d)

    # nb rows per program: keep the fp32 logits tile ≤ ~8 MB. The old 2 MB
    # cap left nb=1 at S=640 → 2560 single-row programs whose per-program
    # overhead dominated (25.5 ms/call traced vs a ~3 ms compute floor);
    # nb=4 fits comfortably now that the 64 MiB scoped-VMEM option ships.
    cap = _env_int("MOCA_TPU_FA_SMALL_CAP_MB") or (8 if _big_vmem() else 2)
    nb = max(1, (cap * 1024 * 1024) // (s * s * 4))
    while bh % nb:
        nb -= 1
    grid = (bh // nb,)
    blk = pl.BlockSpec((nb, s, d), lambda i: (i, 0, 0))
    cost = pl.CostEstimate(
        flops=4 * bh * s * s * d,
        bytes_accessed=4 * bh * s * d * q.dtype.itemsize,
        transcendentals=bh * s * s,
    )
    fq, fk, fv = fold(q), fold(k), fold(v)

    def call(variant):
        guard = variant == "guarded"
        kern = functools.partial(_fa_small_kernel, scale=scale,
                                 nomax=variant == "nomax", guard=guard)
        out_shape = jax.ShapeDtypeStruct((bh, s, d), q.dtype)
        if guard:
            out_shape = (out_shape,
                         jax.ShapeDtypeStruct((grid[0], 8, 128), jnp.float32))
        return pl.pallas_call(
            kern,
            out_shape=out_shape,
            grid=grid,
            in_specs=[blk, blk, blk],
            out_specs=(blk, pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0)))
            if guard else blk,
            cost_estimate=cost,
        )(fq, fk, fv)

    if mode == "guarded":
        out, flags = call("guarded")
        out = jax.lax.cond(
            jnp.any(flags != 0.0),
            lambda: call("safe"),
            lambda: out,
        )
    else:
        out = call(mode)
    return out.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _packed_tiny_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads, d,
                        qmask=True, nomax=False):
    """Tiny-sequence attention on PACKED heads ([nb, S, H·D] blocks).

    For the temporal transformers (S=16, batch B·H·W ≈ 40960): XLA's
    head-major einsum materializes [N, h, 16, 16] fp32 logits and
    head-split copies in HBM (~430 ms/step profiled); here everything stays
    in VMEM. Heads are separated by MASKED full-width dots — 64-lane slices
    at arbitrary offsets crash the Mosaic compiler for C≥512, so each head's
    contraction runs over all C lanes with the other heads' lanes zeroed
    (the extra zero-lane FLOPs are negligible at S=16).
    """
    q = q_ref[...]  # [nb, S, C]
    k = k_ref[...]
    v = v_ref[...]
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, dimension=2)
    o_ref[...] = jnp.zeros_like(o_ref)
    for hh in range(heads):
        mask = jnp.logical_and(lane >= hh * d, lane < (hh + 1) * d)
        km = jnp.where(mask, k, jnp.zeros_like(k))
        # masking k alone selects the head: every q·k product outside the
        # head's lanes multiplies km's zeros, so q need not be masked — bit-
        # identical logits, one fewer [nb,S,C] VPU select per head
        # (MOCA_TPU_FA_PACKEDQM=0 drops it; default keeps the validated
        # double-masked form until the variant is measured on-chip)
        qm = jnp.where(mask, q, jnp.zeros_like(q)) if qmask else q
        logits = jax.lax.dot_general(
            qm, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [nb, S, S]
        p = _softmax_rows(logits, nomax)
        vm = jnp.where(mask, v, jnp.zeros_like(v))
        out = jax.lax.dot_general(
            p.astype(v.dtype), vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # heads occupy disjoint lanes → accumulate directly in the output
        # buffer (adding zeros elsewhere); no fp32 scratch needed
        o_ref[...] += out.astype(o_ref.dtype)


def _packed_slice_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, heads, d,
                         nomax=False):
    """Tiny-sequence packed attention via in-kernel 64-lane SLICES.

    Same job as `_packed_tiny_kernel` but separates heads with static
    lane slices instead of masked full-width dots — each head's
    contraction runs over its own d lanes only (no `heads`× flop/select
    redundancy). Only viable at C=320: this Mosaic version lowers 64-lane
    slices/stores at C=320 but crashes on them at C ≥ 512 (see CLAUDE.md);
    the C ≥ 512 widths use the 128-lane-grid `_packed_lane_kernel`.
    """
    q = q_ref[...]  # [nb, S, C]
    k = k_ref[...]
    v = v_ref[...]
    for hh in range(heads):
        lo, hi = hh * d, (hh + 1) * d
        logits = jax.lax.dot_general(
            q[:, :, lo:hi], k[:, :, lo:hi], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [nb, S, S]
        p = _softmax_rows(logits, nomax)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v[:, :, lo:hi], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[:, :, lo:hi] = out.astype(o_ref.dtype)


def _packed_lane_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, hpb, d,
                        nomax=False):
    """Tiny-sequence attention on a LANE BLOCK of packed heads.

    Unlike `_packed_tiny_kernel` (full channel width per program, `heads`×3
    masked selects + `heads`× redundant contraction lanes), grid axis 1
    walks the channel dim in 128-lane blocks (= 2 heads at d=64; Pallas
    requires last-dim blocks divisible by 128, so C=320 stays on the
    full-width kernel). A program touches only its own heads' lanes: the
    select/flop redundancy is 2× over 128 lanes instead of heads× over the
    full width — 4-10× less VPU+MXU work at C ≥ 512. v5e trace before:
    the packed temporal calls ran at ~35 % of HBM roofline (compute-bound
    on the masked redundancy).
    """
    q = q_ref[...]  # [nb, S, hpb·d]
    k = k_ref[...]
    v = v_ref[...]
    if hpb == 1:
        logits = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [nb, S, S]
        p = _softmax_rows(logits, nomax)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        o_ref[...] = out.astype(o_ref.dtype)
        return
    lane = jax.lax.broadcasted_iota(jnp.int32, q.shape, dimension=2)
    o_ref[...] = jnp.zeros_like(o_ref)
    for hh in range(hpb):
        mask = jnp.logical_and(lane >= hh * d, lane < (hh + 1) * d)
        # masking k alone selects the head (q·0 elsewhere) — bit-identical
        # logits to masking both, one fewer select (cf. _packed_tiny_kernel)
        km = jnp.where(mask, k, jnp.zeros_like(k))
        logits = jax.lax.dot_general(
            q, km, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        p = _softmax_rows(logits, nomax)
        vm = jnp.where(mask, v, jnp.zeros_like(v))
        out = jax.lax.dot_general(
            p.astype(v.dtype), vm, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # heads occupy disjoint lanes → accumulate in the output block
        o_ref[...] += out.astype(o_ref.dtype)


def _fused_qkv_kernel(x_ref, wq_ref, wk_ref, wv_ref, wo_ref, bo_ref, o_ref,
                      *, scale, heads, d, nomax=False):
    """QKV projections + tiny-S attention + out projection in ONE pass.

    The r3 FIFO trace showed the temporal transformers' C→C projection
    dots lowering as conv-over-T emitters at 12-23 % of MXU peak plus a
    canonical↔N-minor relayout copy per q/k/v operand (~340 ms/iteration
    across widths; docs/PERF.md). Fusing the whole chain into one program
    reads x once, keeps q/k/v/logits in VMEM/registers, and pays the
    layout transition once per attention instead of 4-6×.

    Head separation: in-kernel 64-lane slices at C=320 (proven by
    `_packed_slice_kernel`); 128-lane slices with a 2-head lane mask at
    C % 128 == 0 (64-lane slicing crashes Mosaic at C ≥ 512, 128-lane
    aligned slices lower fine).
    """
    nb, s, c = x_ref.shape
    x2 = x_ref[...].reshape(nb * s, c)

    def proj(w_ref):
        y = jax.lax.dot_general(
            x2, w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return y.astype(x2.dtype).reshape(nb, s, c)

    q = proj(wq_ref)
    k = proj(wk_ref)
    v = proj(wv_ref)

    def head_attn(qs, ks, vs):
        logits = jax.lax.dot_general(
            qs, ks, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [nb, S, S]
        p = _softmax_rows(logits, nomax)
        return jax.lax.dot_general(
            p.astype(vs.dtype), vs, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32).astype(x2.dtype)

    outs = []
    if c == heads * d and c % 128 != 0:
        # exact per-head 64-lane slices (C=320 path)
        for hh in range(heads):
            lo, hi = hh * d, (hh + 1) * d
            outs.append(head_attn(q[:, :, lo:hi], k[:, :, lo:hi],
                                  v[:, :, lo:hi]))
    else:
        # 128-lane slices = 2 heads; mask k/v per head inside the slice
        hpb = 128 // d
        lane = jax.lax.broadcasted_iota(jnp.int32, (nb, s, 128), dimension=2)
        for jj in range(c // 128):
            lo, hi = jj * 128, (jj + 1) * 128
            qs, ks, vs = q[:, :, lo:hi], k[:, :, lo:hi], v[:, :, lo:hi]
            acc = None
            for hh in range(hpb):
                mask = jnp.logical_and(lane >= hh * d, lane < (hh + 1) * d)
                km = jnp.where(mask, ks, jnp.zeros_like(ks))
                vm = jnp.where(mask, vs, jnp.zeros_like(vs))
                out = head_attn(qs, km, vm)
                acc = out if acc is None else acc + out
            outs.append(acc)
    attn = jnp.concatenate(outs, axis=2) if len(outs) > 1 else outs[0]

    o = jax.lax.dot_general(
        attn.reshape(nb * s, c), wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o = o.astype(x2.dtype) + bo_ref[...].astype(x2.dtype)
    o_ref[...] = o.reshape(nb, s, c)


def fused_qkv_attention(x: jnp.ndarray, wq: jnp.ndarray, wk: jnp.ndarray,
                        wv: jnp.ndarray, wo: jnp.ndarray, bo: jnp.ndarray,
                        heads: int) -> jnp.ndarray:
    """Fused to_q/to_k/to_v → packed tiny-S attention → to_out (+bias).

    x [N, S, C]; w* [C, C]; bo [C]. Self-attention only (inner == C),
    d = C // heads. See `_fused_qkv_kernel`.
    """

    n, s, c = x.shape
    d = c // heads
    scale = d**-0.5
    # the S=16 logits tiles are tiny relative to the [nb,S,C] IO — the
    # nomax saving is negligible here, so "guarded" keeps the exact form
    nomax = _softmax_mode() == "nomax"
    # rows/program: keep the x block ≈ 16K lane-elements like the lane
    # kernel (655 KB bf16 at S=16); override for sweeps
    nb = _env_int("MOCA_TPU_FA_FUSED_NB") or max(
        8, (64 * 320) // c)
    nb = 1 << (nb.bit_length() - 1)
    while n % nb:
        nb //= 2
    grid = (n // nb,)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape))
    return pl.pallas_call(
        functools.partial(_fused_qkv_kernel, scale=scale, heads=heads, d=d,
                          nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0)),
            full((c, c)), full((c, c)), full((c, c)), full((c, c)),
            full((1, c)),
        ],
        out_specs=pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * s * c * c + 4 * n * s * s * c,
            bytes_accessed=2 * n * s * c * x.dtype.itemsize
            + 4 * c * c * x.dtype.itemsize,
            transcendentals=n * heads * s * s,
        ),
    )(x, wq, wk, wv, wo, bo.reshape(1, c))


def _packed_lane_attention(q, k, v, *, d, bc, nomax):
    """Lane-blocked dispatch of the packed temporal attention."""

    n, s, c = q.shape
    scale = d**-0.5
    hpb = bc // d
    # rows per program: keep per-block IO constant across widths (~16K
    # lane-elements); override for sweeps with MOCA_TPU_FA_LANE_NB
    nb = _env_int("MOCA_TPU_FA_LANE_NB") or (16384 // bc)
    nb = 1 << (nb.bit_length() - 1)
    while n % nb:
        nb //= 2
    grid = (n // nb, c // bc)
    return pl.pallas_call(
        functools.partial(_packed_lane_kernel, scale=scale, hpb=hpb, d=d,
                          nomax=nomax),
        out_shape=jax.ShapeDtypeStruct((n, s, c), q.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((nb, s, bc), lambda i, j: (i, 0, j))] * 3,
        out_specs=pl.BlockSpec((nb, s, bc), lambda i, j: (i, 0, j)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * s * s * c * hpb,
            bytes_accessed=4 * n * s * c * q.dtype.itemsize,
            transcendentals=n * (c // d) * s * s,
        ),
    )(q, k, v)


def packed_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     heads: int) -> jnp.ndarray:
    """Self-attention on [N, S, H·D] without splitting heads at the XLA
    level (no head-major transposes). For tiny S (temporal layers)."""

    n, s, c = q.shape
    d = c // heads
    scale = d**-0.5
    qmask = os.environ.get("MOCA_TPU_FA_PACKEDQM", "1") == "1"
    nomax = _softmax_mode() == "nomax"  # guarded keeps exact tiny-S softmax
    # 128-lane head-pair blocks where the width allows it (Pallas requires
    # last-dim blocks divisible by 128 — C=320 stays on the full-width
    # kernel); covers C ∈ {512, 640, 1280}
    if (os.environ.get("MOCA_TPU_FA_PACKED_LANE", "1") == "1"
            and d == 64 and c % 128 == 0):
        return _packed_lane_attention(q, k, v, d=d, bc=128, nomax=nomax)
    # C=320 (the one packed width not divisible by 128): in-kernel 64-lane
    # slices lower fine at this width (Mosaic rejects them at C >= 512) —
    # kills the heads× masked redundancy without a second launch. On-chip
    # A/B at [40960,16,320]: 6.45 vs 7.89 ms/call, bit-identical (the
    # two-call lane-split variant measured 11.2 ms — see docs/PERF.md).
    use_slice = (os.environ.get("MOCA_TPU_FA_PACKED_SLICE", "1") == "1"
                 and d == 64 and c == 320)
    # scale rows-per-program with channel width to stay under the 16MB
    # scoped VMEM limit with double-buffered IO (nb=128 at C=320 OOMed at
    # the T2V batch shape; wider channels need proportionally fewer rows)
    nb = _env_int("MOCA_TPU_FA_PACKED_NB") or max(
        8, (64 * 320) // c)
    nb = 1 << (nb.bit_length() - 1)  # round down to a power of two
    while n % nb:
        nb //= 2
    grid = (n // nb,)
    if use_slice:
        kernel = functools.partial(_packed_slice_kernel, scale=scale,
                                   heads=heads, d=d, nomax=nomax)
    else:
        kernel = functools.partial(_packed_tiny_kernel, scale=scale,
                                   heads=heads, d=d, qmask=qmask, nomax=nomax)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, c), q.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0))] * 3,
        out_specs=pl.BlockSpec((nb, s, c), lambda i: (i, 0, 0)),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * heads * s * s * d,
            bytes_accessed=4 * n * s * c * q.dtype.itemsize,
            transcendentals=n * heads * s * s,
        ),
    )(q, k, v)


# fp32 logits-tile budget for single-program (whole-S / full-KV) shapes:
# fits S=2560 (26.2 MB) under the tuned 64 MiB scoped-VMEM option with the
# double-buffered IO blocks; larger sequences fall back to blocked kv.
_WHOLE_S_CAP = 27 * 1024 * 1024


def _choose_flash_blocks(sq: int, sk: int, big_vmem: bool,
                         bq_env: int = 0, bkv_env: int = 0):
    """(bq, bkv) for the large-S flash path. Pure — unit-tested directly.

    Under the big-VMEM compile option: whole-S one-shot (bq=sq, bkv=sk —
    one program per (b, h)) whenever the fp32 logits tile fits
    `_WHOLE_S_CAP`; full-KV (bkv=sk) for any env-pinned bq whose tile
    fits; blocked otherwise. A plain 16 MiB jit always takes the blocked
    path — Mosaic cannot compile the big tiles there. Env overrides must
    divide the sequence or they are ignored."""
    if bq_env and sq % bq_env == 0:
        bq = bq_env
    elif big_vmem and sq * sk * 4 <= _WHOLE_S_CAP:
        bq = sq  # whole-S one-shot (r5 A/B, docs/PERF.md round 5)
    else:
        bq = _pick_block(sq, candidates=(640, 512, 256, 128, 64, 32, 16, 8))
    # full-KV cap: the 27 MB tile is proven ONLY for the single-program
    # whole-S case (bq == sq, no q grid axis — the r5 receipt); a blocked
    # bq with a multi-program grid keeps the r3-tested 8 MB margin —
    # larger tiles there are unmeasured shapes that could crash Mosaic
    # where the blocked path below is known-good.
    full_kv_cap = _WHOLE_S_CAP if bq == sq else 8 * 1024 * 1024
    if bkv_env and sk % bkv_env == 0:
        bkv = bkv_env
    elif big_vmem and bq * sk * 4 <= full_kv_cap:
        bkv = sk  # full-KV logits tile
    else:
        bkv = _pick_block(
            sk, candidates=(1280, 1024, 640, 512, 256, 128, 64, 32, 16, 8))
    return bq, bkv


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Fused attention on [B, S, H, D]; softmax in fp32. No bias/mask.

    Internally heads-major [B, H, S, D] so every Pallas block keeps (seq, d)
    as its trailing dims (TPU tiling wants the last two block dims to be
    8/128-aligned or full); XLA usually fuses the transposes into the
    surrounding projections.

    Deliberately NOT wrapped in its own jax.jit: block shapes depend on the
    caller's compile options via the big-VMEM contextvar (xla_opts), and an
    inner jit caches the jaxpr per (fn, avals) — the first caller's block
    choice would win for the whole process, compiling full-KV blocks under
    plain jits (Mosaic failure) or conservative blocks under tuned ones
    (silent perf loss). Every product caller jits at a higher level.
    """

    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq == sk and sq <= 640 and sq % 8 == 0:
        return _small_attention(q, k, v)
    # Block-size history on v5e (FIFO bench, S=2560): r1 bq=bkv=512 →
    # 3.05 s/frame, bkv=1280 the r2 sweet spot (1.867 s/frame with the
    # lane-blocked temporal kernel). r3: FULL-KV blocks (bkv=sk) are
    # fastest — no online-softmax state, no kv grid axis — now that the
    # tuned 64 MiB scoped-VMEM compile option ships (the r1 full-KV
    # attempt predated it and regressed): bq 640/2560 → 1.839, 1280/2560
    # → 1.838, vs 1280/1280 → 1.867. r5: WHOLE-S one-shot blocks
    # (bq=sq AND bkv=sk — one program per (b,h), 26.2 MB logits tile, a
    # second r1 negative reversed by the 64 MiB option) beat bq=640:
    # interleaved A/B 1.796/1.796/1.797 vs 1.816/1.809/1.847 s/frame,
    # MFU 58.5 → 59.1; bq=320 measured neutral (1.815). Env overrides for
    # sweeps (must divide the sequence).
    bq, bkv = _choose_flash_blocks(
        sq, sk, _big_vmem(),
        _env_int("MOCA_TPU_FA_BQ"), _env_int("MOCA_TPU_FA_BKV"))
    nq, nkv = sq // bq, sk // bkv
    scale = d**-0.5

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)

    stat_lanes = (1 if os.environ.get("MOCA_TPU_FA_NARROWSTAT", "0") == "1"
                  else _LANES)
    mode = _softmax_mode()
    nomax = mode == "nomax"
    if os.environ.get("MOCA_TPU_FA_ONEPASS", "0") == "1" and nkv == 1:
        out = pl.pallas_call(
            functools.partial(_fa_onepass_kernel, scale=scale, nomax=nomax),
            out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
            grid=(b, h, nq),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel")),
            in_specs=[
                pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
                pl.BlockSpec((1, 1, sk, d), lambda b_, h_, i: (b_, h_, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, bq, d),
                                   lambda b_, h_, i: (b_, h_, i, 0)),
            cost_estimate=pl.CostEstimate(
                flops=4 * b * h * sq * sk * d,
                bytes_accessed=(q.size + k.size + v.size + q.size)
                * q.dtype.itemsize,
                transcendentals=b * h * sq * sk,
            ),
        )(qt, kt, vt)
        return out.transpose(0, 2, 1, 3)
    grid = (b, h, nq, nkv)

    # only the kv axis carries state (online softmax); declaring the rest
    # parallel lets Mosaic pipeline across programs (perf sweep knobs)
    cp_kwargs = {}
    if os.environ.get("MOCA_TPU_FA_DIMSEM", "1") == "1":
        cp_kwargs["dimension_semantics"] = (
            "parallel", "parallel", "parallel", "arbitrary")
    if os.environ.get("MOCA_TPU_FA_INFUSE", "0") == "1":
        cp_kwargs["allow_input_fusion"] = [True, True, True]

    o_spec = pl.BlockSpec((1, 1, bq, d), lambda b_, h_, i, j: (b_, h_, i, 0))
    cost = pl.CostEstimate(
        flops=4 * b * h * sq * sk * d,
        bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
        transcendentals=b * h * sq * sk,
    )

    def call(variant):
        guard = variant == "guarded"
        no_max = variant in ("nomax", "guarded")
        kernel = functools.partial(_fa_kernel, scale=scale, nkv=nkv,
                                   stat_lanes=stat_lanes, nomax=no_max,
                                   guard=guard)
        out_shape = jax.ShapeDtypeStruct(qt.shape, q.dtype)
        out_specs = o_spec
        if guard:
            out_shape = (out_shape, jax.ShapeDtypeStruct(
                (b, h, nq, 8, 128), jnp.float32))
            out_specs = (o_spec, pl.BlockSpec(
                (1, 1, 1, 8, 128), lambda b_, h_, i, j: (b_, h_, i, 0, 0)))
        return pl.pallas_call(
            kernel,
            out_shape=out_shape,
            grid=grid,
            compiler_params=pltpu.CompilerParams(**cp_kwargs) if cp_kwargs
            else None,
            in_specs=[
                pl.BlockSpec((1, 1, bq, d),
                             lambda b_, h_, i, j: (b_, h_, i, 0)),
                pl.BlockSpec((1, 1, bkv, d),
                             lambda b_, h_, i, j: (b_, h_, j, 0)),
                pl.BlockSpec((1, 1, bkv, d),
                             lambda b_, h_, i, j: (b_, h_, j, 0)),
            ],
            out_specs=out_specs,
            scratch_shapes=[
                # nomax never touches the running max — allocate the minimum
                # tile instead of [bq, lanes] (frees ~650 KB VMEM at bq=1280)
                pltpu.VMEM((8, stat_lanes) if no_max else (bq, stat_lanes),
                           jnp.float32),  # running max
                pltpu.VMEM((bq, stat_lanes), jnp.float32),  # running denom
                pltpu.VMEM((bq, d), jnp.float32),  # output accumulator
            ],
            cost_estimate=cost,
        )(qt, kt, vt)

    if mode == "guarded":
        out, flags = call("guarded")
        # exact-safe: re-run the max-shifted kernel iff any fp32 output
        # element came out non-finite (never on real attention inputs)
        out = jax.lax.cond(
            jnp.any(flags != 0.0),
            lambda: call("safe"),
            lambda: out,
        )
    else:
        out = call(mode)
    return out.transpose(0, 2, 1, 3)
