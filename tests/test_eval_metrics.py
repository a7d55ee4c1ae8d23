"""SSIM/PSNR metric sanity + vbench glue."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from moca_tpu.eval.metrics import psnr, ssim, temporal_lpips_proxy
from moca_tpu.eval.vbench import summarize, write_full_info


def test_ssim_identity_and_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    one = ssim(img, img)
    np.testing.assert_allclose(np.asarray(one), 1.0, atol=1e-4)
    noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1),
                                                   img.shape), 0, 1)
    s = np.asarray(ssim(img, noisy))
    assert (s < 0.95).all() and (s > -1).all()


def test_ssim_monotone_in_noise():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
    s_small = float(ssim(img, jnp.clip(img + 0.05, 0, 1))[0])
    s_big = float(ssim(img, jnp.clip(img + 0.4, 0, 1))[0])
    assert s_small > s_big


def test_psnr():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
    assert float(psnr(img, img)[0]) > 100
    assert float(psnr(img, jnp.clip(img + 0.1, 0, 1))[0]) < 30


def test_temporal_proxy():
    static = jnp.ones((4, 32, 32, 3)) * 0.5
    assert float(temporal_lpips_proxy(static)) < 1e-3


def test_vbench_roundtrip(tmp_path):
    path = write_full_info(
        str(tmp_path), [{"prompt": "a cat", "video_path": "/x/v.mp4"}],
        timestamp="2026-01-01-00:00:00")
    data = json.load(open(path))
    assert data[0]["prompt_en"] == "a cat"
    assert data[0]["video_list"] == ["/x/v.mp4"]
    # summary aggregation
    with open(tmp_path / "a_eval_results.json", "w") as f:
        json.dump({"Diversity": [0.8, {}], "Human_Anatomy": [0.9, {}]}, f)
    with open(tmp_path / "b_eval_results.json", "w") as f:
        json.dump({"Diversity": [0.6, {}]}, f)
    s = summarize(str(tmp_path))
    np.testing.assert_allclose(s["Diversity"]["mean"], 0.7)
    assert s["Human_Anatomy"]["n"] == 1
