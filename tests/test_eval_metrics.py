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


# ---------------------------------------------------------------------------
# CASS / relCASS
# ---------------------------------------------------------------------------

def test_cass_identity_edit_is_zero():
    from moca_tpu.eval.metrics import cass, rel_cass
    assert float(cass(0.3, 0.1, 0.3, 0.1)) == 0.0
    assert float(rel_cass(0.3, 0.1, 0.3, 0.1)) == 0.0


def test_cass_direction_and_antisymmetry():
    from moca_tpu.eval.metrics import cass
    # edited video gains target alignment (+0.1) and sheds source (+0.05)
    c = float(cass(0.30, 0.10, 0.25, 0.20))
    np.testing.assert_allclose(c, 100 * (0.10 + 0.05), rtol=1e-6)
    # swapping src/out videos negates the score
    c_swap = float(cass(0.25, 0.20, 0.30, 0.10))
    np.testing.assert_allclose(c_swap, -c, rtol=1e-6)


def test_rel_cass_scale_invariance():
    """relCASS is invariant to scaling all similarities by a constant."""
    from moca_tpu.eval.metrics import rel_cass
    a = float(rel_cass(0.30, 0.10, 0.25, 0.20))
    b = float(rel_cass(0.15, 0.05, 0.125, 0.10))
    np.testing.assert_allclose(a, b, rtol=1e-6)


def test_concept_alignment_scores_from_embeddings():
    from moca_tpu.eval.metrics import concept_alignment_scores
    rng = np.random.default_rng(0)
    src_txt = rng.standard_normal(16).astype(np.float32)
    tgt_txt = rng.standard_normal(16).astype(np.float32)
    # source frames align with src_txt; edited frames shifted toward tgt_txt
    src_frames = src_txt[None] + 0.1 * rng.standard_normal((5, 16)).astype(np.float32)
    out_frames = (0.4 * src_txt + 0.6 * tgt_txt)[None] + \
        0.1 * rng.standard_normal((5, 16)).astype(np.float32)
    s = concept_alignment_scores(
        jnp.asarray(src_frames), jnp.asarray(out_frames),
        jnp.asarray(src_txt), jnp.asarray(tgt_txt))
    assert float(s["cass"]) > 0
    assert float(s["rel_cass"]) > 0
    assert float(s["sim_src_src"]) > float(s["sim_out_src"])
    assert float(s["sim_out_tgt"]) > float(s["sim_src_tgt"])


def test_clip_text_embed_output_mode():
    """output='embed' runs the FULL tower + EOT pool + text_projection."""
    from moca_tpu.models.clip_text import CLIPTextConfig, CLIPTextEncoder
    cfg = CLIPTextConfig(width=16, heads=2, layers=3, vocab_size=100,
                         context_length=8)
    enc = CLIPTextEncoder(cfg)
    tokens = jnp.asarray([[1, 5, 7, 99, 0, 0, 0, 0]])  # EOT(99) at pos 3
    params = enc.init(jax.random.PRNGKey(0), tokens, output="embed")
    emb = enc.apply(params, tokens, output="embed")
    assert emb.shape == (1, 16)
    # penultimate path works off the same (superset) tree
    feats = enc.apply(params, tokens)
    assert feats.shape == (1, 8, 16)
    # EOT pooling: moving tokens AFTER the EOT position must not change
    # the pooled embedding's source position (argmax picks EOT)
    tokens2 = jnp.asarray([[1, 5, 7, 99, 3, 2, 1, 4]])
    emb2 = enc.apply(params, tokens2, output="embed")
    assert emb2.shape == (1, 16)


# ---------------------------------------------------------------------------
# FVD (Fréchet Video Distance)
# ---------------------------------------------------------------------------

def test_frechet_distance_closed_form_diagonal():
    """For diagonal Gaussians d² = ||Δμ||² + Σ(√d1−√d2)²."""
    from moca_tpu.eval.fvd import frechet_distance
    rng = np.random.default_rng(0)
    d1 = rng.uniform(0.5, 2.0, 8)
    d2 = rng.uniform(0.5, 2.0, 8)
    mu1 = rng.standard_normal(8)
    mu2 = rng.standard_normal(8)
    got = frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    want = np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(d1) - np.sqrt(d2)) ** 2)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_frechet_distance_full_covariance_vs_scipy():
    """Cross-check the eigh-based tr(sqrtm(Σ1Σ2)) against scipy.linalg.sqrtm
    on random full covariances (gated on scipy being importable)."""
    import pytest
    sqrtm = pytest.importorskip("scipy.linalg").sqrtm
    from moca_tpu.eval.fvd import frechet_distance
    rng = np.random.default_rng(1)
    for trial in range(3):
        a = rng.standard_normal((6, 6))
        b = rng.standard_normal((6, 6))
        s1, s2 = a @ a.T + 0.1 * np.eye(6), b @ b.T + 0.1 * np.eye(6)
        mu1, mu2 = rng.standard_normal(6), rng.standard_normal(6)
        want = (np.sum((mu1 - mu2) ** 2) + np.trace(s1) + np.trace(s2)
                - 2.0 * np.trace(np.real(sqrtm(s1 @ s2))))
        got = frechet_distance(mu1, s1, mu2, s2)
        np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_fvd_from_features_identity_symmetry_and_shift():
    from moca_tpu.eval.fvd import fvd_from_features
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((512, 16))
    assert abs(fvd_from_features(feats, feats)) < 1e-9
    shifted = rng.standard_normal((512, 16)) + 2.0
    d_ab = fvd_from_features(feats, shifted)
    d_ba = fvd_from_features(shifted, feats)
    np.testing.assert_allclose(d_ab, d_ba, rtol=1e-9)
    # dominated by the mean shift: ||Δμ||² ≈ 16·4 = 64 for unit-variance sets
    assert 40 < d_ab < 90


def test_fvd_end_to_end_feature_fn_and_batching():
    """fvd() with a host feature_fn: batch_size must not change the result,
    and identical video sets score ~0."""
    from moca_tpu.eval.fvd import fvd
    rng = np.random.default_rng(3)
    vids_a = rng.uniform(size=(10, 4, 8, 8, 3))
    vids_b = rng.uniform(size=(10, 4, 8, 8, 3)) * 0.5

    def feature_fn(batch):  # [B,T,H,W,C] → [B, 12] spatial moment features
        flat = batch.reshape(batch.shape[0], batch.shape[1], -1)
        return np.concatenate([flat.mean(-1), flat.std(-1),
                               flat.max(-1)], axis=-1)

    d_full = fvd(vids_a, vids_b, feature_fn, batch_size=10)
    d_chunked = fvd(vids_a, vids_b, feature_fn, batch_size=3)
    np.testing.assert_allclose(d_full, d_chunked, rtol=1e-12)
    assert d_full > 0
    assert abs(fvd(vids_a, vids_a, feature_fn)) < 1e-9


# ---------------------------------------------------------------------------
# LPIPS plumbing
# ---------------------------------------------------------------------------

def _lpips_setup():
    from moca_tpu.eval.metrics import AlexNetFeatures
    net = AlexNetFeatures()
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    lin = [jnp.abs(jax.random.normal(jax.random.fold_in(
        jax.random.PRNGKey(1), i), (c,))) for i, c in
        enumerate([64, 192, 384, 256, 256])]
    return params, lin


def test_lpips_zero_for_identical_and_positive_otherwise():
    from moca_tpu.eval.metrics import lpips
    params, lin = _lpips_setup()
    a = jax.random.uniform(jax.random.PRNGKey(2), (2, 64, 64, 3)) * 2 - 1
    d_same = np.asarray(lpips(a, a, params, lin))
    np.testing.assert_allclose(d_same, 0.0, atol=1e-6)
    b = jnp.clip(a + 0.5, -1, 1)
    d_diff = np.asarray(lpips(a, b, params, lin))
    assert (d_diff > 0).all()
    # symmetry
    np.testing.assert_allclose(d_diff, np.asarray(lpips(b, a, params, lin)),
                               rtol=1e-5)


def test_lpips_wrappers_and_converter():
    from moca_tpu.eval.metrics import (
        convert_lpips_weights, lpips_i, lpips_t)
    params, lin = _lpips_setup()
    vid = jax.random.uniform(jax.random.PRNGKey(3), (3, 64, 64, 3)) * 2 - 1
    assert float(lpips_t(vid, params, lin)) > 0
    assert float(lpips_i(vid, vid, params, lin)) < 1e-6
    # converter: synthetic torchvision-format state dicts land in the tree
    rng = np.random.default_rng(4)
    specs = {0: (64, 3, 11), 3: (192, 64, 5), 6: (384, 192, 3),
             8: (256, 384, 3), 10: (256, 256, 3)}
    alex_sd = {}
    for i, (o, c, k) in specs.items():
        alex_sd[f"features.{i}.weight"] = rng.standard_normal(
            (o, c, k, k)).astype(np.float32)
        alex_sd[f"features.{i}.bias"] = np.zeros(o, np.float32)
    lp_sd = {f"lin{i}.model.1.weight":
             np.abs(rng.standard_normal((1, ch, 1, 1))).astype(np.float32)
             for i, ch in enumerate([64, 192, 384, 256, 256])}
    p2, lin2 = convert_lpips_weights(alex_sd, lp_sd)
    from moca_tpu.eval.metrics import AlexNetFeatures
    out = AlexNetFeatures().apply(p2, jnp.zeros((1, 64, 64, 3)))
    assert [f.shape[-1] for f in out] == [64, 192, 384, 256, 256]
    assert [w.shape[0] for w in lin2] == [64, 192, 384, 256, 256]


def test_streaming_fvd_matches_batch_fvd():
    """StreamingFVD (per-pair incremental features) must reproduce the
    batch fvd() path on the same sets, fix the clip length from the first
    usable pair, and count skipped shorter pairs."""
    import numpy as np

    from moca_tpu.eval.fvd import StreamingFVD, fvd_from_features

    rng = np.random.default_rng(0)

    def feature_fn(batch):  # [1, T, H, W, C] → [1, 8] deterministic
        v = np.asarray(batch)
        flat = v.reshape(v.shape[0], -1)
        return np.stack([flat[:, i::8].mean(axis=1) for i in range(8)], 1)

    vids_a = [rng.uniform(0, 1, (12, 4, 4, 3)) for _ in range(4)]
    vids_b = [rng.uniform(0, 1, (12, 4, 4, 3)) for _ in range(4)]
    s = StreamingFVD(feature_fn, min_frames=9)
    for a, b in zip(vids_a, vids_b):
        assert s.add(a, b)
    assert s.clip_len == 12 and s.skipped == 0
    want = fvd_from_features(
        np.concatenate([feature_fn(a[None]) for a in vids_a]),
        np.concatenate([feature_fn(b[None]) for b in vids_b]))
    assert abs(s.result() - want) < 1e-9

    # a shorter pair arriving WITHIN the warmup window lowers the clip
    # length for the whole set (the r5-review scenario: first pair longer
    # than the rest must not doom every later pair); < min_frames always
    # skips; mismatched lengths use the pairwise min
    s2 = StreamingFVD(feature_fn, min_frames=9, warmup_pairs=4)
    assert not s2.add(vids_a[0][:5], vids_b[0][:5])  # < min_frames
    assert s2.clip_len is None and s2.skipped == 1
    assert s2.add(vids_a[0], vids_b[0])              # buffered (len 12)
    assert s2.add(vids_a[1][:10], vids_b[1])         # buffered, min → 10
    assert s2.clip_len is None                       # warmup not full yet
    assert s2.result() is not None                   # flush establishes
    assert s2.clip_len == 10 and s2.skipped == 1
    want2 = fvd_from_features(
        np.concatenate([feature_fn(vids_a[0][:10][None]),
                        feature_fn(vids_a[1][:10][None])]),
        np.concatenate([feature_fn(vids_b[0][:10][None]),
                        feature_fn(vids_b[1][:10][None])]))
    assert abs(s2.result() - want2) < 1e-9

    # post-establishment shorter pairs are skipped and counted
    assert not s2.add(vids_a[2][:9], vids_b[2])
    assert s2.skipped == 2
    assert s2.add(vids_a[3], vids_b[3][:13])         # clipped to 10

    # explicit clip_len skips the warmup buffer entirely
    s3 = StreamingFVD(feature_fn, min_frames=9, clip_len=10)
    assert s3.add(vids_a[0], vids_b[0])
    assert len(s3._warmup) == 0 and s3.clip_len == 10
