"""Video quality metrics (JAX, device-runnable).

The reference defers metrics to an external git submodule
(`common_metrics_on_video_quality`, .gitmodules:1-3) and VBench JSON sweeps
(SURVEY §4). Here SSIM/PSNR are first-class (SSIM is also the parity
criterion vs the CUDA reference — BASELINE.md: per-frame SSIM ≥ 0.98), plus
a VGG-free temporal-consistency proxy (mean Δframe SSIM) standing in for
LPIPS-T until perceptual weights are supplied.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _gaussian_kernel(size: int = 11, sigma: float = 1.5):
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over [..., H, W, C] images (standard Wang et al. windowed
    formulation; matches skimage defaults gaussian_weights=True)."""
    k = _gaussian_kernel(kernel_size, sigma)[..., None, None]  # HWIO, 1→1

    def filt(x):
        # depthwise: apply per channel
        x_ = jnp.moveaxis(x, -1, 0)[..., None]  # [C, ..., H, W, 1]
        shape = x_.shape
        flat = x_.reshape((-1,) + shape[-3:])
        out = jax.lax.conv_general_dilated(
            flat, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.moveaxis(out.reshape(shape[:-3] + out.shape[-3:])[..., 0],
                            0, -1)

    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(-3, -2, -1))


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2,
                   axis=(-3, -2, -1))
    return 10.0 * jnp.log10(max_val**2 / jnp.maximum(mse, 1e-12))


def temporal_lpips_proxy(video: jnp.ndarray) -> jnp.ndarray:
    """Mean 1−SSIM between consecutive frames of [T, H, W, C] — a
    perceptual-weight-free stand-in for LPIPS-T (lower = smoother)."""
    return jnp.mean(1.0 - ssim(video[:-1], video[1:]))


# ---------------------------------------------------------------------------
# CASS / relCASS — the paper's headline concept-alignment metric
# (BASELINE.md Table 2; the reference repo ships only the rendered table,
# assets/results/metric.png via README.md:139, no code)
# ---------------------------------------------------------------------------

def clip_cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cosine similarity along the last axis (broadcasting batch dims)."""
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True).clip(1e-8)
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True).clip(1e-8)
    return jnp.sum(a * b, axis=-1)


def cass(sim_src_src, sim_src_tgt, sim_out_src, sim_out_tgt,
         scale: float = 100.0):
    """Concept Alignment Shift Score (MoCA-Video paper, arXiv 2506.01004).

    Measures how far the edited video moves toward the target concept and
    away from the source prompt in CLIP space:

        CASS = scale · [ (sim(out, tgt) − sim(src, tgt))     # target gain
                       + (sim(src, src) − sim(out, src)) ]   # source drop

    where sim(v, p) is the mean frame-embedding ↔ text-embedding cosine.
    The ×100 scale matches the magnitude of the published table (CASS 4.93)
    — the paper ships no metric code, so the exact normalization is our
    documented convention (DECISIONS.md). Identity edits score 0; swapping
    the two videos negates the score.
    """
    return scale * ((sim_out_tgt - sim_src_tgt) + (sim_src_src - sim_out_src))


def rel_cass(sim_src_src, sim_src_tgt, sim_out_src, sim_out_tgt,
             scale: float = 1.0):
    """Relative CASS: each shift term normalized by its source-video
    baseline, making the score insensitive to the absolute CLIP similarity
    level of the scene (same caveat as `cass`: convention documented, no
    reference code exists).

        relCASS = scale · [ (sim(out,tgt) − sim(src,tgt)) / |sim(src,tgt)|
                          + (sim(src,src) − sim(out,src)) / |sim(src,src)| ]
    """
    t = (sim_out_tgt - sim_src_tgt) / jnp.abs(sim_src_tgt).clip(1e-8)
    s = (sim_src_src - sim_out_src) / jnp.abs(sim_src_src).clip(1e-8)
    return scale * (t + s)


def concept_alignment_scores(
    src_frame_emb: jnp.ndarray,  # [T, D] CLIP image embeddings, source video
    out_frame_emb: jnp.ndarray,  # [T, D] edited video
    src_text_emb: jnp.ndarray,   # [D] source prompt embedding
    tgt_text_emb: jnp.ndarray,   # [D] target concept embedding
) -> dict:
    """All four video↔prompt similarities + CASS/relCASS from embeddings.

    Embeddings come from the in-repo towers: `CLIPVisionEncoder(output=
    'pooled')` per frame and `CLIPTextEncoder(output='embed')` per prompt
    (weights-gated: the t2v checkpoint has no visual tower — pass CLIP
    vision weights separately, see scripts/eval_sweep.py --clip_vision_ckpt).
    """
    sim = {
        "sim_src_src": jnp.mean(clip_cosine(src_frame_emb, src_text_emb)),
        "sim_src_tgt": jnp.mean(clip_cosine(src_frame_emb, tgt_text_emb)),
        "sim_out_src": jnp.mean(clip_cosine(out_frame_emb, src_text_emb)),
        "sim_out_tgt": jnp.mean(clip_cosine(out_frame_emb, tgt_text_emb)),
    }
    sim["cass"] = cass(sim["sim_src_src"], sim["sim_src_tgt"],
                       sim["sim_out_src"], sim["sim_out_tgt"])
    sim["rel_cass"] = rel_cass(sim["sim_src_src"], sim["sim_src_tgt"],
                               sim["sim_out_src"], sim["sim_out_tgt"])
    return sim


# ---------------------------------------------------------------------------
# LPIPS (Zhang et al. 2018) — AlexNet backbone, weights-gated
# (the reference defers LPIPS to the common_metrics_on_video_quality
# submodule; here the full math is native, only the torchvision-AlexNet +
# LPIPS linear weights must be supplied via convert_lpips_weights)
# ---------------------------------------------------------------------------

_LPIPS_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_LPIPS_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class AlexNetFeatures(nn.Module):
    """torchvision-AlexNet feature stages tapped after each ReLU — the five
    LPIPS layers (channels 64/192/384/256/256). Input [N, H, W, 3] in the
    LPIPS-normalized space; use `lpips` below for end-to-end scoring."""

    @nn.compact
    def __call__(self, x):
        conv = lambda f, k, s, p, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=((p, p), (p, p)), name=name)
        feats = []
        x = nn.relu(conv(64, 11, 4, 2, "conv1")(x)); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(192, 5, 1, 2, "conv2")(x)); feats.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = nn.relu(conv(384, 3, 1, 1, "conv3")(x)); feats.append(x)
        x = nn.relu(conv(256, 3, 1, 1, "conv4")(x)); feats.append(x)
        x = nn.relu(conv(256, 3, 1, 1, "conv5")(x)); feats.append(x)
        return feats


def lpips_from_features(feats_a, feats_b, lin_weights) -> jnp.ndarray:
    """LPIPS distance given per-layer features and the learned per-channel
    linear weights (each [C_l], non-negative): unit-normalize channels,
    squared difference, channel-weighted sum, spatial mean, layer sum."""
    total = 0.0
    for fa, fb, w in zip(feats_a, feats_b, lin_weights):
        na = fa / jnp.linalg.norm(fa, axis=-1, keepdims=True).clip(1e-10)
        nb = fb / jnp.linalg.norm(fb, axis=-1, keepdims=True).clip(1e-10)
        d = (na - nb) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(-2, -1))
    return total


def lpips(a: jnp.ndarray, b: jnp.ndarray, params, lin_weights) -> jnp.ndarray:
    """LPIPS between image batches [N, H, W, 3] in [-1, 1]."""
    net = AlexNetFeatures()
    norm = lambda x: (x.astype(jnp.float32) - _LPIPS_SHIFT) / _LPIPS_SCALE
    return lpips_from_features(
        net.apply(params, norm(a)), net.apply(params, norm(b)), lin_weights)


def lpips_i(src_video, out_video, params, lin_weights) -> jnp.ndarray:
    """LPIPS-I: mean per-frame perceptual distance edited↔source (Table 2:
    higher = stronger edit)."""
    return jnp.mean(lpips(src_video, out_video, params, lin_weights))


def lpips_t(video, params, lin_weights) -> jnp.ndarray:
    """LPIPS-T: mean perceptual distance between consecutive frames
    (Table 2: lower = temporally smoother)."""
    return jnp.mean(lpips(video[:-1], video[1:], params, lin_weights))


def convert_lpips_weights(alexnet_sd, lpips_sd) -> tuple:
    """(torchvision alexnet state_dict, LPIPS 'alex' lin state_dict) →
    (AlexNetFeatures params, [w_l] lin weights). Keys: features.{0,3,6,8,10}
    and lin{0..4}.model.1.weight [1,C,1,1]."""
    import numpy as np

    def conv(i):
        w = np.asarray(alexnet_sd[f"features.{i}.weight"], np.float32)
        return {"kernel": w.transpose(2, 3, 1, 0),
                "bias": np.asarray(alexnet_sd[f"features.{i}.bias"], np.float32)}

    params = {"params": {f"conv{n+1}": conv(i)
                         for n, i in enumerate([0, 3, 6, 8, 10])}}
    lins = [np.asarray(lpips_sd[f"lin{i}.model.1.weight"],
                       np.float32).reshape(-1) for i in range(5)]
    return params, lins
