"""i2v numerics: torch-oracle parity for the CLIP image preprocessing
(the reference's kornia bicubic resize, condition.py:264-272, delegates to
torch F.interpolate) and a full LatentVisualDiffusion pipeline e2e with
synthetic vision weights (token concat → img_cross_attention split → sample).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu.models.clip_vision import (
    CLIPVisionConfig, bicubic_resize_weights, preprocess, resize_bicubic,
)

from tests.oracle import load_reference  # torch import + skip handling


@pytest.mark.parametrize("in_size,out_size", [(320, 224), (100, 224),
                                              (224, 224), (37, 64)])
@pytest.mark.parametrize("align_corners", [True, False])
@pytest.mark.parametrize("antialias", [True, False])
def test_bicubic_weights_match_torch(in_size, out_size, align_corners,
                                     antialias):
    ref = load_reference()
    torch = ref.torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((1, 1, in_size)).astype(
        np.float32)
    out_t = F.interpolate(torch.from_numpy(x)[None], size=(1, out_size),
                          mode="bicubic", align_corners=align_corners,
                          antialias=antialias).numpy()[0, 0, 0]
    W = bicubic_resize_weights(in_size, out_size, align_corners, antialias)
    np.testing.assert_allclose(W @ x[0, 0], out_t, atol=2e-4)


def test_preprocess_matches_reference_kornia_semantics():
    """Full preprocess: bicubic(align_corners=True, antialias=True) resize +
    (x+1)/2 + CLIP mean/std (condition.py:264-272)."""
    ref = load_reference()
    torch = ref.torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    img = (rng.uniform(-1, 1, (2, 320, 512, 3))).astype(np.float32)

    out_f = preprocess(jnp.asarray(img), 224)

    x = torch.from_numpy(np.moveaxis(img, -1, 1))
    x = F.interpolate(x, (224, 224), mode="bicubic", align_corners=True,
                      antialias=True)
    x = (x + 1.0) / 2.0
    mean = torch.tensor([0.48145466, 0.4578275, 0.40821073])[None, :, None, None]
    std = torch.tensor([0.26862954, 0.26130258, 0.27577711])[None, :, None, None]
    out_t = ((x - mean) / std).movedim(1, -1).numpy()
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)


def test_resize_bicubic_2d_matches_torch():
    ref = load_reference()
    torch = ref.torch
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    img = rng.standard_normal((1, 50, 70, 3)).astype(np.float32)
    out_f = resize_bicubic(jnp.asarray(img), (33, 41))
    out_t = F.interpolate(torch.from_numpy(np.moveaxis(img, -1, 1)),
                          (33, 41), mode="bicubic", align_corners=True,
                          antialias=True).movedim(1, -1).numpy()
    np.testing.assert_allclose(np.asarray(out_f), out_t, atol=2e-4)


# ---------------------------------------------------------------------------
# i2v end-to-end with synthetic weights
# ---------------------------------------------------------------------------

def _build_i2v(finegrained):
    from moca_tpu.models.clip_text import CLIPTextConfig
    from moca_tpu.models.latent_diffusion import init_random_visual_model
    from moca_tpu.models.unet3d import UNetConfig
    from moca_tpu.models.vae import VAEConfig

    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2), num_res_blocks=1,
        temporal_length=2, use_image_attention=True)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=32)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    vision_cfg = CLIPVisionConfig(image_size=28, patch_size=14, width=24,
                                  heads=2, layers=2, output_dim=16)
    return init_random_visual_model(
        unet_cfg, vae_cfg, clip_cfg, vision_cfg, jax.random.PRNGKey(0),
        latent_hw=(4, 4), frames=2, finegrained=finegrained)


@pytest.mark.parametrize("finegrained", [False, True])
def test_i2v_pipeline_end_to_end(finegrained):
    """image → CLIP vision → projector tokens → text‖image context concat →
    DDIM sample → decode (batch_ddim_sampling's i2v path, inference.py:110-117
    + funcs.py:136-141 zero-image uncond)."""
    from moca_tpu.models.tokenizer import HashTokenizer
    from moca_tpu.pipelines.t2v import T2VPipeline

    model = _build_i2v(finegrained)
    # zero-init last layers make a fresh model identity (reference parity) —
    # randomize them so conditioning sensitivity is observable
    from tests.test_models import randomize_zero_params
    model.unet_params = randomize_zero_params(model.unet_params)
    image = jax.random.uniform(jax.random.PRNGKey(1), (1, 40, 40, 3),
                               minval=-1, maxval=1)
    tokens = model.get_image_embeds(image)
    n_tok = 16 if finegrained else 4
    assert tokens.shape == (1, n_tok, 16)

    pipe = T2VPipeline.build(model, HashTokenizer(), num_steps=4,
                             guidance_scale=7.5)
    video = pipe("a boat", jax.random.PRNGKey(2), height=32, width=32,
                 frames=2, image_tokens=tokens)
    assert video.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(video)).all()

    # the image conditioning must actually influence the sample
    tokens_b = model.get_image_embeds(-image)
    video_b = pipe("a boat", jax.random.PRNGKey(2), height=32, width=32,
                   frames=2, image_tokens=tokens_b)
    assert np.abs(np.asarray(video) - np.asarray(video_b)).max() > 1e-6
