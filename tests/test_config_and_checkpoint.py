"""Config YAML surface + orbax checkpoint roundtrip."""

import numpy as np
import jax.numpy as jnp

from moca_tpu.config import load_model_config


def test_load_shipped_yaml():
    cfg = load_model_config("configs/inference_t2v_512_v2.0.yaml")
    assert cfg.diffusion.timesteps == 1000
    assert cfg.diffusion.linear_start == 0.00085
    assert cfg.diffusion.linear_end == 0.012
    assert cfg.diffusion.use_scale is True
    assert cfg.diffusion.scale_b == 0.7
    assert cfg.diffusion.scale_factor == 0.18215
    assert cfg.diffusion.uncond_type == "empty_seq"
    assert cfg.unet.model_channels == 320
    assert cfg.unet.attention_resolutions == (4, 2, 1)
    assert cfg.unet.channel_mult == (1, 2, 4, 4)
    assert cfg.unet.num_head_channels == 64
    assert cfg.unet.context_dim == 1024
    assert cfg.unet.temporal_length == 16
    assert cfg.unet.addition_attention is True
    assert cfg.unet.fps_cond is True
    assert cfg.vae.ch == 128
    assert cfg.vae.ch_mult == (1, 2, 4, 4)
    assert cfg.vae.resolution == 512
    assert cfg.clip.penultimate is True
    assert cfg.is_i2v is False


def test_vestigial_encoder_targets_rejected():
    """The four encoder classes the reference ships but no shipped config
    uses (condition.py:57 FrozenT5Embedder, :89 FrozenCLIPEmbedder, :136
    ClipImageEmbedder, :377 FrozenCLIPT5Encoder) must fail with a NAMED
    error instead of silently building the OpenCLIP tower (DECISIONS #9);
    unknown targets are rejected too, the real targets pass."""
    import copy

    import pytest
    import yaml

    from moca_tpu.config import model_config_from_dict

    with open("configs/inference_t2v_512_v2.0.yaml") as f:
        base = yaml.safe_load(f)

    def with_target(dotted, key="cond_stage_config"):
        raw = copy.deepcopy(base)
        mp = raw["model"]["params"]
        mp.setdefault(key, {})["target"] = dotted
        return raw

    for name in ("FrozenT5Embedder", "FrozenCLIPEmbedder",
                 "ClipImageEmbedder", "FrozenCLIPT5Encoder"):
        with pytest.raises(NotImplementedError, match=name):
            model_config_from_dict(with_target(
                f"lvdm.modules.encoders.condition.{name}"))
    # the i2v image-embedder slot is validated too
    with pytest.raises(NotImplementedError, match="FrozenT5Embedder"):
        model_config_from_dict(with_target(
            "lvdm.modules.encoders.condition.FrozenT5Embedder",
            key="cond_img_config"))
    with pytest.raises(ValueError, match="unknown cond_stage_config"):
        model_config_from_dict(with_target("some.module.MysteryEncoder"))
    # implemented targets still parse
    assert model_config_from_dict(with_target(
        "lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder"))
    assert model_config_from_dict(with_target(
        "lvdm.modules.encoders.condition.FrozenOpenCLIPImageEmbedderV2",
        key="cond_img_config")).is_i2v


def test_bf16_dtype_plumbed():
    cfg = load_model_config("configs/inference_t2v_512_v2.0.yaml",
                            dtype="bf16")
    assert cfg.unet.dtype == jnp.bfloat16


def test_orbax_roundtrip(tmp_path):
    from moca_tpu.io.checkpoint import (load_flax_checkpoint,
                                        save_flax_checkpoint)

    trees = {
        "unet": {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)}},
        "vae": {"params": {"b": np.ones(4, np.float32)}},
        "clip": {"params": {"t": np.zeros((2, 2), np.float32)}},
    }
    path = str(tmp_path / "ckpt")
    save_flax_checkpoint(path, trees)
    back = load_flax_checkpoint(path)
    np.testing.assert_array_equal(back["unet"]["params"]["w"],
                                  trees["unet"]["params"]["w"])
    np.testing.assert_array_equal(back["vae"]["params"]["b"],
                                  trees["vae"]["params"]["b"])
