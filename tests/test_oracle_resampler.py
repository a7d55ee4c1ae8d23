"""Activation parity: the reference's ACTUAL IP-Adapter projectors
(ref: lvdm/modules/encoders/ip_resampler.py:7-135, PyTorch CPU) vs the Flax
`ImageProjModel` / `Resampler` through `convert_image_proj` — the i2v image
conditioning path (LatentVisualDiffusion, ddpm3d.py:660-694).
"""

import numpy as np
import jax.numpy as jnp

from moca_tpu.models.convert import convert_image_proj
from moca_tpu.models.ip_resampler import ImageProjModel, Resampler

from tests.oracle import (
    assert_close, load_reference, randomize_module, state_dict_numpy, to_torch,
)


def test_image_proj_model_parity():
    ref = load_reference()
    t_mod = ref.ip_resampler.ImageProjModel(
        cross_attention_dim=40, clip_embeddings_dim=48,
        clip_extra_context_tokens=4)
    randomize_module(t_mod, seed=20)
    params = convert_image_proj(state_dict_numpy(t_mod), prefix="")
    f_mod = ImageProjModel(cross_attention_dim=40, clip_extra_context_tokens=4)

    rng = np.random.default_rng(21)
    x = rng.standard_normal((3, 48)).astype(np.float32)
    with ref.torch.no_grad():
        out_t = t_mod(to_torch(x))
    out_f = f_mod.apply(params, jnp.asarray(x))
    assert_close(out_f, out_t, atol=1e-5, label="ImageProjModel")


def test_resampler_parity():
    ref = load_reference()
    t_mod = ref.ip_resampler.Resampler(
        dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
        embedding_dim=48, output_dim=56, ff_mult=4)
    randomize_module(t_mod, seed=22)
    params = convert_image_proj(state_dict_numpy(t_mod), prefix="")
    f_mod = Resampler(dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
                      embedding_dim=48, output_dim=56, ff_mult=4)

    rng = np.random.default_rng(23)
    x = rng.standard_normal((2, 12, 48)).astype(np.float32)  # patch tokens
    with ref.torch.no_grad():
        out_t = t_mod(to_torch(x))
    out_f = f_mod.apply(params, jnp.asarray(x))
    assert_close(out_f, out_t, atol=1e-5, label="Resampler")


def test_resampler_converted_tree_matches_flax_init():
    import jax

    ref = load_reference()
    t_mod = ref.ip_resampler.Resampler(
        dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
        embedding_dim=48, output_dim=56, ff_mult=4)
    params = convert_image_proj(state_dict_numpy(t_mod), prefix="")
    f_mod = Resampler(dim=64, depth=2, dim_head=16, heads=4, num_queries=8,
                      embedding_dim=48, output_dim=56, ff_mult=4)
    init = f_mod.init(jax.random.PRNGKey(0), jnp.zeros((1, 12, 48)))

    def paths(tree):
        return {jax.tree_util.keystr(p): np.shape(v)
                for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}

    assert paths(init) == paths(params)
