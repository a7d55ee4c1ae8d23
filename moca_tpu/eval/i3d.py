"""InceptionI3d feature extractor for FVD — the `videogpt` variant.

The reference computes FVD via the `common_metrics_on_video_quality` git
submodule (reference `.gitmodules:1-3`), whose `videogpt` method loads the
piergiaj/pytorch-i3d `InceptionI3d` (Kinetics-400 head,
`i3d_pretrained_400.pt`) and feeds the 400-d logits into the Fréchet fit
(`eval/fvd.py` here). That architecture is replicated natively: channels-last
NDHWC, a pure-JAX apply over a converted params tree, BatchNorm folded into
the conv kernels at convert time (inference-only — the reference also runs
it in eval mode). Weights are gated exactly like LPIPS: the checkpoint does
not exist in this environment, so `convert_i3d_weights` takes the torch
state_dict whenever the user supplies it, and the torch-replica oracle
(`tests/test_oracle_i3d.py`) certifies the math on randomized weights.

Layout/parity notes:
- TF-style SAME padding: the torch original hand-computes SAME pads
  (`MaxPool3dSamePadding.compute_pad`, `Unit3D.compute_pad`); XLA's
  `padding="SAME"` implements the identical convention.
- The torch max-pools pad with ZEROS, XLA pads with -inf; every max-pool
  here consumes post-ReLU (≥ 0) activations, where the two agree.
- The logits head is the original's exact (2,7,7) VALID average pool →
  1×1×1 conv → time mean (NOT a global mean: the stride-1 time window
  weights interior frames double), so inputs must be ≥ 193 px spatial
  (193→97→49→25→13→7 through the five stride-2 stages — roughly
  224-class inputs) and ≥ 9 frames, like the original.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax.linen import avg_pool, max_pool
from jax import lax

# Inception blocks: name -> (b0, b1a, b1b, b2a, b2b, b3b) output channels.
_INCEPTION_CFG = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


def _conv(p: Dict, x: jnp.ndarray, stride=(1, 1, 1),
          padding: str = "SAME") -> jnp.ndarray:
    y = lax.conv_general_dilated(
        x, p["kernel"], stride, padding,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return y + p["bias"] if "bias" in p else y


def _unit(p: Dict, x: jnp.ndarray, stride=(1, 1, 1)) -> jnp.ndarray:
    """Unit3D: conv (+folded BN as bias/kernel scale) + ReLU."""
    return jax.nn.relu(_conv(p, x, stride))


def _inception(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    b0 = _unit(p["b0"], x)
    b1 = _unit(p["b1b"], _unit(p["b1a"], x))
    b2 = _unit(p["b2b"], _unit(p["b2a"], x))
    b3 = _unit(p["b3b"], max_pool(x, (3, 3, 3), (1, 1, 1), "SAME"))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_features(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Backbone through Mixed_5c. x: [B, T, H, W, 3] in [-1, 1] →
    [B, T/8, H/32, W/32, 1024]."""
    x = _unit(params["Conv3d_1a_7x7"], x, (2, 2, 2))
    x = max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")   # MaxPool3d_2a_3x3
    x = _unit(params["Conv3d_2b_1x1"], x)
    x = _unit(params["Conv3d_2c_3x3"], x)
    x = max_pool(x, (1, 3, 3), (1, 2, 2), "SAME")   # MaxPool3d_3a_3x3
    x = _inception(params["Mixed_3b"], x)
    x = _inception(params["Mixed_3c"], x)
    x = max_pool(x, (3, 3, 3), (2, 2, 2), "SAME")   # MaxPool3d_4a_3x3
    for name in ("Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"):
        x = _inception(params[name], x)
    x = max_pool(x, (2, 2, 2), (2, 2, 2), "SAME")   # MaxPool3d_5a_2x2
    x = _inception(params["Mixed_5b"], x)
    return _inception(params["Mixed_5c"], x)


def i3d_logits(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    """Kinetics-400 logits [B, 400] from preprocessed video [B,T,H,W,3] in
    [-1, 1] — the videogpt FVD feature vector (dropout is a no-op in the
    original's eval mode)."""
    if x.shape[1] < 9:
        raise ValueError(
            f"I3D needs ≥9 input frames (got T={x.shape[1]}): the temporal "
            "stride-8 backbone + (2,·,·) head window would otherwise "
            "silently mean over an empty axis → NaN logits")
    f = i3d_features(params, x)
    if f.shape[2] < 7 or f.shape[3] < 7:
        raise ValueError(
            f"I3D head needs ≥7×7 Mixed_5c maps (got {f.shape[2]}×"
            f"{f.shape[3]}): input must be ≥193 px spatial (roughly "
            "224-class inputs), like the original's fixed (2,7,7) "
            "average pool")
    f = avg_pool(f, (2, 7, 7), (1, 1, 1), "VALID")
    y = _conv(params["logits"], f)              # 1×1×1 conv, bias, no act
    return jnp.mean(y, axis=1)[:, 0, 0, :]


def i3d_preprocess(videos: jnp.ndarray, target: int = 224) -> jnp.ndarray:
    """[B, T, H, W, C] in [0, 1] → bilinear resize to target² (half-pixel
    centers, antialias OFF ≡ torch `interpolate(..., align_corners=False)`
    — jax's default antialias=True widens the kernel on DOWNSCALE, the
    common 320×512 → 224² case, and diverges from torch by up to 0.46)
    → [-1, 1]."""
    b, t, _, _, c = videos.shape
    x = jax.image.resize(videos.astype(jnp.float32),
                         (b, t, target, target, c), "bilinear",
                         antialias=False)
    return x * 2.0 - 1.0


def i3d_feature_fn(params: Dict) -> Callable[[np.ndarray], np.ndarray]:
    """A `feature_fn` for `eval.fvd.fvd`: video batch [B, T, H, W, 3] in
    [0, 1] → [B, 400] logits. Params ride as a jit argument (axon remote
    compile rejects closure-captured weight constants)."""
    jitted = jax.jit(lambda p, v: i3d_logits(p, i3d_preprocess(v)))

    def fn(videos):
        return np.asarray(jitted(params, jnp.asarray(videos)))

    return fn


def convert_i3d_weights(state_dict) -> Dict:
    """piergiaj/pytorch-i3d `InceptionI3d(400)` state_dict → params tree.

    BN (eps=1e-3, the original Unit3D's value) is folded:
    kernel' = kernel · γ/√(σ²+ε) (per out-channel), bias' = β − μ·γ/√(σ²+ε).
    The logits Unit3D has a real conv bias and no BN.
    """

    def np32(t):
        return np.asarray(t, np.float32)

    def unit(prefix, bn=True):
        # torch [out, in, kT, kH, kW] → DHWIO [kT, kH, kW, in, out]
        w = np32(state_dict[f"{prefix}.conv3d.weight"]).transpose(2, 3, 4, 1, 0)
        if bn:
            g = np32(state_dict[f"{prefix}.bn.weight"])
            b = np32(state_dict[f"{prefix}.bn.bias"])
            m = np32(state_dict[f"{prefix}.bn.running_mean"])
            v = np32(state_dict[f"{prefix}.bn.running_var"])
            s = g / np.sqrt(v + 1e-3)
            return {"kernel": w * s, "bias": b - m * s}
        out = {"kernel": w}
        if f"{prefix}.conv3d.bias" in state_dict:
            out["bias"] = np32(state_dict[f"{prefix}.conv3d.bias"])
        return out

    params = {
        "Conv3d_1a_7x7": unit("Conv3d_1a_7x7"),
        "Conv3d_2b_1x1": unit("Conv3d_2b_1x1"),
        "Conv3d_2c_3x3": unit("Conv3d_2c_3x3"),
        "logits": unit("logits", bn=False),
    }
    for name in _INCEPTION_CFG:
        params[name] = {b: unit(f"{name}.{b}")
                        for b in ("b0", "b1a", "b1b", "b2a", "b2b", "b3b")}
    return params
