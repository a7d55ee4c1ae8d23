"""Reference-oracle harness: import the reference's actual PyTorch modules
(from /root/reference, read-only) under CPU torch and expose helpers for
activation-parity tests against the Flax towers through models/convert.py.

The reference repo needs `pytorch_lightning` (absent in this image) only for
class bases / logging — a minimal stub suffices. Everything else the core
model modules need (torch, einops, numpy) is installed.

Usage:
    ref = load_reference()   # pytest.skip()s if the oracle can't load
    unet = ref.openaimodel3d.UNetModel(**kwargs)
"""

from __future__ import annotations

import sys
import types

import numpy as np
import pytest

_REF_PATH = "/root/reference"
_cache = None


def load_reference():
    """Import the reference lvdm modules once; skip tests when unavailable."""
    global _cache
    if _cache is not None:
        return _cache
    try:
        import torch
    except ImportError:
        pytest.skip("torch not installed — reference oracle unavailable")
    if _REF_PATH not in sys.path:
        sys.path.insert(0, _REF_PATH)
    # Stub pytorch_lightning: AutoencoderKL subclasses pl.LightningModule
    # (autoencoder.py:13) but uses none of lightning's machinery at inference.
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl
    try:
        from lvdm.modules.networks import openaimodel3d, ae_modules
        from lvdm.models import autoencoder
        from lvdm.modules import attention
        from lvdm.modules.encoders import ip_resampler
        from lvdm.models import utils_diffusion
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    ns = types.SimpleNamespace(
        torch=torch,
        openaimodel3d=openaimodel3d,
        ae_modules=ae_modules,
        autoencoder=autoencoder,
        attention=attention,
        ip_resampler=ip_resampler,
        utils_diffusion=utils_diffusion,
    )
    _cache = ns
    return ns


def randomize_module(module, seed: int = 0, scale: float = 0.08):
    """Fill EVERY parameter with seeded gaussians — including the reference's
    zero-initialized last layers (zero_module, openaimodel3d.py:177,266,531),
    without which a fresh model is an identity function and parity tests
    would pass vacuously."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    module.eval()
    return module


def state_dict_numpy(module) -> dict:
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}


def to_torch(x):
    import torch

    return torch.from_numpy(np.asarray(x, np.float32))


def assert_close(flax_out, torch_out, atol=1e-4, rtol=1e-4, label=""):
    a = np.asarray(flax_out, np.float64)
    b = torch_out.detach().cpu().numpy().astype(np.float64)
    assert a.shape == b.shape, f"{label}: shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=label)
