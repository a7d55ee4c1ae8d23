"""Torch oracle for the LPIPS metric (eval/metrics.py:151-219).

The reference defers LPIPS to the common_metrics_on_video_quality submodule
(which wraps richzhang/PerceptualSimilarity 'alex'); neither torchvision nor
lpips is importable here, so the oracle is a plain-torch replica of the
published pieces: the torchvision AlexNet `features` Sequential (indices
0,3,6,8,10 are the convs LPIPS taps after ReLU) and the LPIPS head
(scaling layer → unit-normalize → squared diff → 1×1 lin conv → spatial
mean → layer sum). Randomized weights through `convert_lpips_weights`
pin down torch's maxpool/pad semantics per tap and the end-to-end score.
"""

import numpy as np
import jax.numpy as jnp
import torch
from torch import nn

from moca_tpu.eval.metrics import (
    _LPIPS_SCALE, _LPIPS_SHIFT, AlexNetFeatures, convert_lpips_weights, lpips,
)

from tests.oracle import assert_close, randomize_module


class TorchAlexFeatures(nn.Module):
    """torchvision.models.AlexNet().features, verbatim layout — state-dict
    keys features.{0,3,6,8,10}.{weight,bias} as convert_lpips_weights
    expects. Taps = outputs after each ReLU (LPIPS NetLinLayer inputs)."""

    def __init__(self):
        super().__init__()
        self.features = nn.Sequential(
            nn.Conv2d(3, 64, 11, stride=4, padding=2), nn.ReLU(),    # 0, 1
            nn.MaxPool2d(3, 2),                                      # 2
            nn.Conv2d(64, 192, 5, padding=2), nn.ReLU(),             # 3, 4
            nn.MaxPool2d(3, 2),                                      # 5
            nn.Conv2d(192, 384, 3, padding=1), nn.ReLU(),            # 6, 7
            nn.Conv2d(384, 256, 3, padding=1), nn.ReLU(),            # 8, 9
            nn.Conv2d(256, 256, 3, padding=1), nn.ReLU(),            # 10, 11
            nn.MaxPool2d(3, 2),                                      # 12
        )

    def forward(self, x):
        taps, out = [], x
        for i, layer in enumerate(self.features):
            out = layer(out)
            if i in (1, 4, 7, 9, 11):
                taps.append(out)
        return taps


def _torch_lpips(net, a, b, lins):
    """richzhang LPIPS forward: scaling layer → features → per-channel unit
    norm (eps=1e-10) → squared diff → lin 1×1 → spatial mean → sum."""
    shift = torch.tensor(np.asarray(_LPIPS_SHIFT)).view(1, 3, 1, 1)
    scale = torch.tensor(np.asarray(_LPIPS_SCALE)).view(1, 3, 1, 1)
    fa = net((a - shift) / scale)
    fb = net((b - shift) / scale)
    total = 0.0
    for xa, xb, w in zip(fa, fb, lins):
        na = xa / (xa.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb) ** 2
        total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean((1, 2))
    return total


def _pair(seed=50):
    t_net = randomize_module(TorchAlexFeatures(), seed=seed, scale=0.05)
    rng = np.random.default_rng(seed)
    lpips_sd = {
        f"lin{i}.model.1.weight":
            rng.uniform(0, 1, (1, c, 1, 1)).astype(np.float32)
        for i, c in enumerate([64, 192, 384, 256, 256])}
    alex_sd = {k: v.detach().numpy() for k, v in t_net.state_dict().items()}
    params, lin_w = convert_lpips_weights(alex_sd, lpips_sd)
    lins_t = [torch.from_numpy(lpips_sd[f"lin{i}.model.1.weight"])
              for i in range(5)]
    return t_net, params, lin_w, lins_t


def test_alexnet_feature_taps_parity():
    """Each of the five tapped activations — conv padding, stride-4 first
    conv, and the two interleaved maxpools (floor semantics) must all
    match torch exactly."""
    t_net, params, _, _ = _pair(seed=51)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        taps_t = t_net(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    taps_f = AlexNetFeatures().apply(params, jnp.asarray(x))
    assert len(taps_f) == len(taps_t) == 5
    for n, (f, t) in enumerate(zip(taps_f, taps_t)):
        assert_close(jnp.moveaxis(f, -1, 1), t, atol=5e-5, rtol=2e-4,
                     label=f"alex tap {n}")


def test_lpips_end_to_end_parity():
    t_net, params, lin_w, lins_t = _pair(seed=52)
    rng = np.random.default_rng(2)
    a = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        d_t = _torch_lpips(t_net, torch.from_numpy(a.transpose(0, 3, 1, 2)),
                           torch.from_numpy(b.transpose(0, 3, 1, 2)), lins_t)
    d_f = lpips(jnp.asarray(a), jnp.asarray(b), params, lin_w)
    assert_close(d_f, d_t, atol=5e-5, rtol=2e-4, label="lpips")


def test_lpips_identical_inputs_zero():
    _, params, lin_w, _ = _pair(seed=53)
    a = np.random.default_rng(3).uniform(-1, 1, (2, 64, 64, 3)).astype(
        np.float32)
    d = np.asarray(lpips(jnp.asarray(a), jnp.asarray(a), params, lin_w))
    np.testing.assert_allclose(d, 0.0, atol=1e-6)
