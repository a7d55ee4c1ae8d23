"""i2v model family: CLIP vision tower, IP projectors, context concat."""

import numpy as np
import jax
import jax.numpy as jnp

from moca_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder, preprocess
from moca_tpu.models.ip_resampler import ImageProjModel, PerceiverAttention, Resampler


def test_preprocess_shapes_and_range():
    img = jnp.zeros((2, 64, 48, 3))  # [-1,1] black
    out = preprocess(img, 32)
    assert out.shape == (2, 32, 32, 3)
    # (x+1)/2 = 0.5 → (0.5-mean)/std
    np.testing.assert_allclose(
        np.asarray(out[0, 0, 0]),
        (0.5 - np.array([0.48145466, 0.4578275, 0.40821073]))
        / np.array([0.26862954, 0.26130258, 0.27577711]),
        rtol=1e-5)


def test_vision_encoder_pooled_and_tokens():
    cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=32, heads=2,
                           layers=2, output_dim=16)
    m = CLIPVisionEncoder(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 40, 40, 3),
                             minval=-1, maxval=1)
    params = m.init(jax.random.PRNGKey(1), img)
    pooled = m.apply(params, img)
    assert pooled.shape == (2, 16)
    tokens = m.apply(params, img, output="tokens")
    assert tokens.shape == (2, 5, 32)  # 2x2 patches + cls


def test_image_proj_model():
    m = ImageProjModel(cross_attention_dim=16, clip_extra_context_tokens=4)
    emb = jax.random.normal(jax.random.PRNGKey(0), (3, 24))
    params = m.init(jax.random.PRNGKey(1), emb)
    out = m.apply(params, emb)
    assert out.shape == (3, 4, 16)


def test_resampler():
    m = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=6,
                  embedding_dim=24, output_dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
    params = m.init(jax.random.PRNGKey(1), x)
    out = m.apply(params, x)
    assert out.shape == (2, 6, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_unet_img_cross_attention_context_concat():
    """Dual text+image context: U-Net splits at token 77
    (attention.py:82-87); image tokens change the output."""
    from moca_tpu.models.unet3d import UNetConfig, UNet3D

    cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                     channel_mult=(1,), attention_resolutions=(1,),
                     num_res_blocks=1, temporal_length=2,
                     use_image_attention=True, addition_attention=False)
    m = UNet3D(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 8, 8, 4))
    ts = jnp.full((1, 2), 500, jnp.int32)
    text = jax.random.normal(jax.random.PRNGKey(1), (1, 77, 16))
    img_a = jnp.zeros((1, 4, 16))
    img_b = jnp.ones((1, 4, 16))
    params = m.init(jax.random.PRNGKey(2), x, ts,
                    jnp.concatenate([text, img_a], axis=1))
    # zero-init last layers make a fresh model identity (reference parity) —
    # randomize them so output sensitivity is observable
    from test_models import randomize_zero_params
    params = randomize_zero_params(params)
    ya = m.apply(params, x, ts, jnp.concatenate([text, img_a], axis=1))
    yb = m.apply(params, x, ts, jnp.concatenate([text, img_b], axis=1))
    assert not np.allclose(np.asarray(ya), np.asarray(yb))
