"""Shipped-config converter oracle: the reference's UNetModel + AutoencoderKL
at FULL VideoCrafter2 size (1.4B-param U-Net: model_channels 320, mult
[1,2,4,4], attention at ds {1,2,4}, context 1024, temporal_length 16,
addition_attention + fps_cond; VAE ch 128 mult [1,2,4,4]) vs the Flax towers
through models/convert.py — so every real checkpoint key, Sequential index
and layer width is exercised, not just the shrunken test config
(VERDICT r1 "stretch" item). Spatial dims are kept small ([1,16,8,8,4]);
key coverage and per-layer math are what full size adds, not pixels.

Runs on CPU (torch + jax), ~10 min, ~25 GB RAM. Usage:
    JAX_PLATFORMS=cpu python scripts/full_oracle_check.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402


class _Skip(Exception):
    pass


def _load_reference():
    import types

    import torch

    sys.path.insert(0, "/root/reference")
    if "pytorch_lightning" not in sys.modules:
        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = torch.nn.Module
        sys.modules["pytorch_lightning"] = pl
    from lvdm.models import autoencoder
    from lvdm.modules.networks import openaimodel3d

    return types.SimpleNamespace(torch=torch, openaimodel3d=openaimodel3d,
                                 autoencoder=autoencoder)


def _randomize(torch, module, seed=0, scale=0.05):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for name, b in module.named_buffers():
            if b.dtype.is_floating_point and "relative" in name:
                b.copy_(torch.randn(b.shape, generator=g) * scale)


def check_unet(ref):
    from moca_tpu.models.convert import convert_unet
    from moca_tpu.models.unet3d import UNet3D, UNetConfig

    torch = ref.torch
    t0 = time.time()
    t_unet = ref.openaimodel3d.UNetModel(
        in_channels=4, model_channels=320, out_channels=4, num_res_blocks=2,
        attention_resolutions=[1, 2, 4], dropout=0.0,
        channel_mult=[1, 2, 4, 4], dims=2, context_dim=1024,
        num_head_channels=64, transformer_depth=1, use_linear=True,
        temporal_conv=True, tempspatial_aware=False, temporal_attention=True,
        temporal_selfatt_only=True, use_relative_position=False,
        use_causal_attention=False, temporal_length=16,
        addition_attention=True, use_image_attention=False,
        temporal_transformer_depth=1, fps_cond=True)
    t_unet.eval()
    _randomize(torch, t_unet, seed=0)
    n_params = sum(p.numel() for p in t_unet.parameters())
    print(f"[{time.time()-t0:.0f}s] reference UNetModel built: "
          f"{n_params/1e9:.3f}B params")

    sd = {k: v.detach().numpy() for k, v in t_unet.state_dict().items()}
    cfg = UNetConfig()  # shipped defaults
    params = convert_unet(sd, cfg, prefix="")
    print(f"[{time.time()-t0:.0f}s] converted "
          f"({len(jax.tree.leaves(params))} leaves)")

    rng = np.random.default_rng(1)
    b, t, h, w = 1, 16, 8, 8
    x = rng.standard_normal((b, t, h, w, 4)).astype(np.float32) * 0.5
    ctx = rng.standard_normal((b, 77, 1024)).astype(np.float32) * 0.5
    # FIFO per-frame timesteps (the is_fifo branch, openaimodel3d.py:535-549)
    ts = np.linspace(40, 960, t).round().astype(np.int64)
    t_frames = np.tile(ts[None], (b, 1)).astype(np.int32)

    with torch.no_grad():
        out_t = t_unet(
            torch.from_numpy(np.moveaxis(x, -1, 1)).contiguous(),
            torch.from_numpy(ts), context=torch.from_numpy(ctx), fps=16)
    out_t = np.moveaxis(out_t.numpy(), 1, -1)
    print(f"[{time.time()-t0:.0f}s] torch forward done")

    f_unet = UNet3D(cfg)
    with jax.disable_jit():  # eager: no 1.4B-graph CPU compile
        out_f = np.asarray(f_unet.apply(
            params, jnp.asarray(x), jnp.asarray(t_frames), jnp.asarray(ctx),
            fps=16))
    print(f"[{time.time()-t0:.0f}s] flax forward done")

    err = np.abs(out_f - out_t).max()
    denom = np.abs(out_t).max()
    print(f"U-Net shipped-config parity: max abs err {err:.3e} "
          f"(|out| max {denom:.3e})")
    assert err < 5e-4, err
    return err


def check_vae(ref):
    from moca_tpu.models.convert import convert_vae
    from moca_tpu.models.vae import AutoencoderKL, VAEConfig

    torch = ref.torch
    ddconfig = dict(double_z=True, z_channels=4, resolution=256,
                    in_channels=3, out_ch=3, ch=128, ch_mult=[1, 2, 4, 4],
                    num_res_blocks=2, attn_resolutions=[], dropout=0.0)
    t_vae = ref.autoencoder.AutoencoderKL(
        ddconfig=ddconfig, lossconfig={"target": "torch.nn.Identity"},
        embed_dim=4)
    t_vae.eval()
    _randomize(torch, t_vae, seed=2, scale=0.03)

    sd = {k: v.detach().numpy() for k, v in t_vae.state_dict().items()}
    cfg = VAEConfig()
    params = convert_vae(sd, cfg, prefix="")

    rng = np.random.default_rng(3)
    img = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    with torch.no_grad():
        moments = t_vae.encode(
            torch.from_numpy(np.moveaxis(img, -1, 1)).contiguous())
        mean_t = moments.mean.numpy()
        dec_t = t_vae.decode(torch.from_numpy(mean_t)).numpy()
    f_vae = AutoencoderKL(cfg)
    with jax.disable_jit():
        mean_f, _ = f_vae.apply(params, jnp.asarray(img),
                                method=f_vae.encode_moments)
        dec_f = f_vae.apply(params, mean_f, method=f_vae.decode)
    e1 = np.abs(np.asarray(mean_f) - np.moveaxis(mean_t, 1, -1)).max()
    e2 = np.abs(np.asarray(dec_f) - np.moveaxis(dec_t, 1, -1)).max()
    print(f"VAE shipped-config parity: encode err {e1:.3e}, "
          f"decode err {e2:.3e}")
    assert e1 < 5e-4 and e2 < 5e-4, (e1, e2)
    return max(e1, e2)


if __name__ == "__main__":
    ref = _load_reference()
    vae_err = check_vae(ref)
    unet_err = check_unet(ref)
    print(f"FULL ORACLE OK  unet={unet_err:.3e}  vae={vae_err:.3e}")
