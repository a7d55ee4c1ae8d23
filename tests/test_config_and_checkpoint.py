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
