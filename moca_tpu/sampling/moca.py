"""MoCA latent manipulation: per-window diagonal DDIM step with
momentum-based semantic correction, mask-guided concept injection, and
noise blending.

Re-designs the reference's `DDIMSampler.ddim_step`
(ref: lvdm/models/samplers/ddim.py:377-649) as a pure function:

  * the python frame loop becomes `lax.scan` over the window's f frames,
  * the momentum buffer becomes explicit scan-carried state. (In the
    reference it is a persistent attribute (ddim.py:395-397), but slot 0 is
    never written and the slot-i update reads slot i-1 written in the SAME
    invocation — i.e. it is semantically a within-window recurrence seeded
    at zero. Carried state reproduces it exactly, and makes windows
    embarrassingly parallel.)
  * visualization is gone from the hot path (the reference runs matplotlib
    quiver plots inside the loop, ddim.py:399-554, and its plot loops shadow
    the frame index `i` (ddim.py:477,502,533) — see DECISIONS.md),
  * γ (noise-blend weight) is actually honored; the reference drops the
    per-prompt γ on the floor (funcs.py:330/347 routes it into U-Net kwargs,
    ddim.py:267-269 never passes it on) so its effective γ is always the
    0.5 default. We default to 0.5 and plumb the value (DECISIONS.md).

Reference-faithful quirks preserved (all with citations):
  * x_prev (the value written back into the FIFO queue) is computed BEFORE
    mask injection and noise blending (ddim.py:562 precedes :565-609), so
    injection affects only the returned pred_x0 — unless
    `inject_into_queue=True`, our documented "fixed" mode.
  * no use_scale correction inside the FIFO step (unlike p_sample_ddim,
    ddim.py:349-355 vs :409-418).
  * DAVIS-mask enhancement is 1.5 for t≤300 else 1.0 (ddim.py:582);
    segmentation-mask enhancement is a constant 2 gated at t≤300
    (ddim.py:592,847).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from moca_tpu.sampling.ddim import shared_normal
from moca_tpu.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class MoCAConfig:
    """Knobs of ddim_step (ref defaults cited inline)."""

    beta: float = 0.9                  # momentum decay (ddim.py:397)
    dir_weight: float = 1.5            # motion_gradient dir_xt weight (ddim.py:423)
    correction_gain: float = 2.0       # correction_strength = g·(1-t/1000) (ddim.py:428)
    gamma: float = 0.5                 # noise blend (ddim.py:377)
    inject_threshold: int = 300        # t ≤ 300 gates injection (ddim.py:582,592)
    davis_enhancement: float = 1.5     # ddim.py:582
    seg_enhancement: float = 2.0       # ddim.py:847
    inject_into_queue: bool = False    # False = reference-faithful (see above)
    enable_momentum: bool = True
    enable_injection: bool = True


def moca_window_step(
    sch: DiffusionSchedule,
    cfg: MoCAConfig,
    x: jnp.ndarray,          # [B, f, h, w, C] window latents
    eps: jnp.ndarray,        # [B, f, h, w, C] CFG'd noise prediction
    indices: jnp.ndarray,    # [f] int32 DDIM schedule indices per frame
    timesteps: jnp.ndarray,  # [f] int32 DDPM timesteps per frame
    key: jax.Array,
    cond_image: Optional[jnp.ndarray] = None,  # [h, w, C] latent-res concept image
    masks: Optional[jnp.ndarray] = None,       # [B, f, h, w, 1] in [0,1], or None
    masks_are_davis: bool = True,
    gamma: Optional[jnp.ndarray] = None,       # overrides cfg.gamma if given
    with_preinject: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """One diagonal denoise of a window. Returns (x_prev, pred_x0), each
    [B, f, h, w, C]; with_preinject additionally returns the
    momentum-corrected pred_x0 BEFORE injection and γ-blend — the tensor the
    reference feeds to its segmentation detector (ddim.py:592-606 passes the
    pre-injection pred_x0 into apply_cond_img).

    Frames are scanned in order; carry = (prev_frame pred_x0, momentum).
    """
    B, f = x.shape[0], x.shape[1]
    g = cfg.gamma if gamma is None else gamma
    frame_keys = jax.random.split(key, f)

    # [f, B, h, w, C] scan order
    xs = jnp.moveaxis(x, 1, 0)
    es = jnp.moveaxis(eps, 1, 0)
    if masks is not None:
        ms = jnp.moveaxis(masks, 1, 0)
    else:
        ms = jnp.zeros((f,) + x.shape[:1] + x.shape[2:4] + (1,), x.dtype)

    have_masks = masks is not None
    enh = cfg.davis_enhancement if masks_are_davis else cfg.seg_enhancement

    def body(carry, per_frame):
        prev_frame, momentum = carry
        x_i, e_i, m_i, idx, t_i, pos, k = per_frame

        a_t = sch.ddim_alphas[idx]
        a_prev = sch.ddim_alphas_prev[idx]
        sigma = sch.ddim_sigmas[idx]
        sqrt_1ma = sch.ddim_sqrt_one_minus_alphas[idx]

        pred_x0 = (x_i - sqrt_1ma * e_i) / jnp.sqrt(a_t)
        dir_xt = jnp.sqrt(jnp.clip(1.0 - a_prev - sigma**2, 0.0)) * e_i

        if cfg.enable_momentum:
            # ddim.py:421-429,557 — EMA of (Δpred_x0 + w·dir_xt), correction
            # strength grows as t→0. Frame 0 has no previous frame: momentum
            # passes through unchanged and no correction is applied.
            motion_grad = (pred_x0 - prev_frame) + cfg.dir_weight * dir_xt
            m_new = cfg.beta * momentum + (1.0 - cfg.beta) * motion_grad
            is_later = (pos > 0).astype(pred_x0.dtype)
            momentum = jnp.where(pos > 0, m_new, momentum)
            strength = cfg.correction_gain * (1.0 - t_i.astype(jnp.float32) / 1000.0)
            pred_x0 = pred_x0 + is_later * strength * momentum

        prev_frame = pred_x0
        pred_preinject = pred_x0

        # noise shared across the prompt batch (ddim.shared_normal: the
        # reference's DDP ranks seed identically → B>1 ≡ B independent runs)
        noise = sigma * shared_normal(k, x_i.shape).astype(x_i.dtype)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise

        # Masks without a concept image inject zeros in the masked region:
        # both the DAVIS branch (ddim.py:572-574) and _apply_segmentation
        # (ddim.py:835-838) substitute zeros_like for a None cond_image.
        cond = cond_image
        if cond is None and have_masks:
            cond = jnp.zeros(x.shape[2:4] + (x.shape[-1],), x.dtype)
        if cfg.enable_injection and have_masks and cond is not None:
            # mask-guided concept injection (ddim.py:565-590 / :897-901)
            if masks_are_davis:
                factor = jnp.where(t_i <= cfg.inject_threshold, enh, 1.0)
                gate = jnp.sum(m_i) > 0  # ddim.py:585 "if mask.sum() != 0"
            else:
                factor = enh
                gate = jnp.logical_and(
                    jnp.sum(m_i) > 0, t_i <= cfg.inject_threshold
                )
            injected = jnp.where(
                m_i > 0.5, cond.astype(pred_x0.dtype) * factor, pred_x0
            )
            pred_x0 = jnp.where(gate, injected, pred_x0)
            if cfg.inject_into_queue:
                x_prev_inj = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
                x_prev = jnp.where(gate, x_prev_inj, x_prev)

        # γ noise blend (ddim.py:609) — same σ-scaled noise as x_prev
        pred_x0 = (1.0 - g) * pred_x0 + g * noise

        return (prev_frame, momentum), (x_prev, pred_x0, pred_preinject)

    init = (jnp.zeros_like(xs[0]), jnp.zeros_like(xs[0]))
    pos = jnp.arange(f)
    (_, _), (x_prevs, pred_x0s, pred_pre) = jax.lax.scan(
        body, init, (xs, es, ms, indices, timesteps, pos, frame_keys)
    )
    if with_preinject:
        return (jnp.moveaxis(x_prevs, 0, 1), jnp.moveaxis(pred_x0s, 0, 1),
                jnp.moveaxis(pred_pre, 0, 1))
    return jnp.moveaxis(x_prevs, 0, 1), jnp.moveaxis(pred_x0s, 0, 1)
