"""Activation parity: the reference's ACTUAL `AutoencoderKL` (PyTorch, CPU)
vs the Flax AE-KL through `models/convert.py`.

Instantiates the real `AutoencoderKL` (ref: lvdm/models/autoencoder.py:13-113
over lvdm/modules/networks/ae_modules.py Encoder/Decoder), randomizes all
weights, converts the state_dict with `convert_vae`, and asserts fp32 parity
on encoder moments and decoded frames — covering ResnetBlocks, the
asymmetric-pad Downsample (ae_modules.py:92-110), Upsample, the vanilla
AttnBlock (both mid and per-resolution), and quant/post_quant convs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from moca_tpu.models.convert import convert_vae
from moca_tpu.models.vae import AutoencoderKL as FlaxAE, VAEConfig

from tests.oracle import (
    assert_close, load_reference, randomize_module, state_dict_numpy, to_torch,
)

DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 2], num_res_blocks=1,
    attn_resolutions=[16],  # exercises the per-resolution AttnBlock path
    dropout=0.0,
)


def build_pair(seed=10):
    ref = load_reference()
    t_ae = ref.autoencoder.AutoencoderKL(
        ddconfig=DDCONFIG,
        lossconfig={"target": "torch.nn.Identity"},
        embed_dim=4,
    )
    randomize_module(t_ae, seed=seed, scale=0.05)
    cfg = VAEConfig(
        double_z=True, z_channels=4, resolution=32, in_channels=3, out_ch=3,
        ch=32, ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(16,),
        embed_dim=4,
    )
    params = convert_vae(state_dict_numpy(t_ae), cfg, prefix="")
    return t_ae, FlaxAE(cfg), params


def test_vae_encoder_moments_parity():
    t_ae, f_ae, params = build_pair()
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    ref = load_reference()
    with ref.torch.no_grad():
        posterior = t_ae.encode(to_torch(np.moveaxis(x, -1, 1)))
    mean_f, logvar_f = f_ae.apply(params, jnp.asarray(x),
                                  method=f_ae.encode_moments)
    assert_close(mean_f, posterior.mean.movedim(1, -1), atol=1e-4,
                 label="posterior mean")
    assert_close(logvar_f, posterior.logvar.movedim(1, -1), atol=1e-4,
                 label="posterior logvar")


def test_vae_decode_parity():
    t_ae, f_ae, params = build_pair(seed=12)
    rng = np.random.default_rng(13)
    z = rng.standard_normal((2, 16, 16, 4)).astype(np.float32)

    ref = load_reference()
    with ref.torch.no_grad():
        out_t = t_ae.decode(to_torch(np.moveaxis(z, -1, 1)))
    out_f = f_ae.apply(params, jnp.asarray(z), method=f_ae.decode)
    assert_close(out_f, out_t.movedim(1, -1), atol=1e-4, label="decode")


def test_vae_mode_roundtrip_parity():
    """encode(mode) → decode: the full deterministic first-stage path the
    pipelines use for DAVIS frames (encode_first_stage_2DAE semantics)."""
    t_ae, f_ae, params = build_pair(seed=14)
    rng = np.random.default_rng(15)
    x = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)

    ref = load_reference()
    with ref.torch.no_grad():
        posterior = t_ae.encode(to_torch(np.moveaxis(x, -1, 1)))
        out_t = t_ae.decode(posterior.mode())
    z_f = f_ae.apply(params, jnp.asarray(x), sample=False,
                     method=f_ae.encode)
    out_f = f_ae.apply(params, z_f, method=f_ae.decode)
    assert_close(out_f, out_t.movedim(1, -1), atol=1e-4, label="roundtrip")


def test_vae_converted_tree_matches_flax_init():
    import jax

    t_ae, f_ae, params = build_pair()
    init = f_ae.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(v)
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    pi, pc = paths(init), paths(params)
    assert pi == pc, (
        f"missing from converter: {sorted(set(pi) - set(pc))[:10]}; "
        f"extra in converter: {sorted(set(pc) - set(pi))[:10]}")
