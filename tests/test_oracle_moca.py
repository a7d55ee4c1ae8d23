"""MoCA-core oracle: the reference's ACTUAL `DDIMSampler.ddim_step`
(lvdm/models/samplers/ddim.py:377-649 — momentum correction, DAVIS-mask
injection, γ noise blend, per-frame DDIM math) vs `moca_window_step`.

The existing parity test (tests/test_moca.py) checks against a hand
translation of the reference loop; this one runs the real torch code.
With ddim_eta=0 every stochastic term is exactly zero (the reference's
noise is σ-scaled, ddim.py:560), so the comparison is deterministic even
at γ>0. SAM2/GroundingDINO/torchvision imports are stubbed; the sampler's
CUDA-forcing `register_buffer` (ddim.py:52-59) is patched to a plain
setattr; the reference's unconditional matplotlib/PNG dumps write under a
temp cwd.

These tests also pin down the reference's visualization-shadowing bug
PRECISELY (SURVEY §2.2 "loop-variable shadowing"): the quiver-plot loops
(`for i in range(len(X))`, ddim.py:477,502,533) overwrite the frame index
before the DAVIS branch reads `davis_masks[:, :, i]` (ddim.py:566), so
every frame after the first injects with mask index len(X)−1 = h/4−1
(mask 9 at the real 40×64 latents) instead of its own mask. moca_tpu
injects the correct per-frame mask (DECISIONS). The oracle therefore runs
with frame-constant masks (bug invisible → full parity) and a separate
test reproduces the corruption exactly.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from moca_tpu.sampling.moca import MoCAConfig, moca_window_step
from moca_tpu.schedule import make_schedule

STEPS, F, H, W, C = 8, 4, 8, 8, 4


def _load_ddim_sampler():
    try:
        import torch  # noqa: F401
    except ImportError:
        pytest.skip("torch not installed")
    os.environ.setdefault("MPLBACKEND", "Agg")
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    # stub the segmentation stacks + torchvision the module imports at top
    # level (torchvision only feeds the visualization dumps)
    for name, attrs in [
        ("sam2", {}),
        ("sam2.build_sam", {"build_sam2": lambda *a, **k: None}),
        ("sam2.sam2_image_predictor", {"SAM2ImagePredictor": object}),
        ("torchvision", {}),
        ("torchvision.utils", {"save_image": lambda *a, **k: None}),
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__spec__ = types.SimpleNamespace(name=name)  # importlib probe
            for k, v in attrs.items():
                setattr(mod, k, v)
            sys.modules[name] = mod
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]
    try:
        from lvdm.models.samplers import ddim as ref_ddim
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference ddim import failed: {e}")
    return ref_ddim


def _make_sampler(ref_ddim, sch):
    import torch

    model = types.SimpleNamespace(
        num_timesteps=1000,
        alphas_cumprod=torch.from_numpy(np.asarray(sch.alphas_cumprod)),
        betas=torch.from_numpy(np.asarray(sch.betas)),
        alphas_cumprod_prev=torch.from_numpy(
            np.asarray(sch.alphas_cumprod_prev)),
        device="cpu",
        use_scale=False,
    )
    sampler = ref_ddim.DDIMSampler(model, use_self_attention=True)
    sampler.register_buffer = types.MethodType(
        lambda self, name, attr: setattr(self, name, attr), sampler)
    sampler.make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, verbose=False)
    return sampler


def _ref_step(sampler, x, eps, indices, ts, cond, masks, gamma):
    import torch

    x_t = torch.from_numpy(np.moveaxis(x, -1, 1)).contiguous()
    e_t = torch.from_numpy(np.moveaxis(eps, -1, 1)).contiguous()
    m_t = (torch.from_numpy(masks[:, :, :, :, 0]).unsqueeze(1)
           if masks is not None else None)
    c_t = (torch.from_numpy(np.moveaxis(cond, -1, 0))[None, :, None]
           if cond is not None else None)
    if hasattr(sampler, "momentum"):
        del sampler.momentum  # fresh window (the buffer persists, SURVEY)
    with torch.no_grad():
        x_prev, pred_x0 = sampler.ddim_step(
            x_t, e_t, list(indices), c_t, None, ts, gamma=gamma,
            davis_masks=m_t)
    return (np.moveaxis(x_prev.numpy(), 1, -1),
            np.moveaxis(pred_x0.numpy(), 1, -1))


def _inputs(seed=0, constant_masks=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((1, F, H, W, C)).astype(np.float32)
    eps = rng.standard_normal((1, F, H, W, C)).astype(np.float32) * 0.3
    if constant_masks:
        m0 = (rng.random((1, 1, H, W, 1)) > 0.5).astype(np.float32)
        masks = np.repeat(m0, F, axis=1)
    else:
        masks = (rng.random((1, F, H, W, 1)) > 0.5).astype(np.float32)
    cond = rng.random((H, W, C)).astype(np.float32)
    return x, eps, masks, cond


@pytest.mark.parametrize("gamma", [0.0, 0.5])
def test_ddim_step_oracle_davis(tmp_path, monkeypatch, gamma):
    """Full parity vs the real torch ddim_step with frame-constant masks
    (the reference's mask-index corruption is invisible then)."""
    ref_ddim = _load_ddim_sampler()
    monkeypatch.chdir(tmp_path)  # the reference dumps PNGs under cwd
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, use_scale=False)
    sampler = _make_sampler(ref_ddim, sch)

    x, eps, masks, cond = _inputs(seed=0, constant_masks=True)
    indices = np.array([1, 3, 5, 7])                 # window diagonal
    ts = np.asarray(sch.ddim_timesteps)[indices]     # spans both sides of 300
    assert (ts <= 300).any() and (ts > 300).any()

    x_prev_ref, pred_x0_ref = _ref_step(
        sampler, x, eps, indices, ts, cond, masks, gamma)
    x_prev_f, pred_x0_f = moca_window_step(
        sch, MoCAConfig(gamma=gamma), jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray(indices, jnp.int32), jnp.asarray(ts, jnp.int32),
        jax.random.PRNGKey(0),
        cond_image=None if cond is None else jnp.asarray(cond),
        masks=jnp.asarray(masks), masks_are_davis=True,
        gamma=jnp.float32(gamma))

    np.testing.assert_allclose(np.asarray(x_prev_f), x_prev_ref,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_x0_f), pred_x0_ref,
                               atol=2e-5, rtol=1e-5)


def test_reference_zeros_cond_shape_bug(tmp_path, monkeypatch):
    """Characterize a second reference bug the oracle surfaced: in the
    DAVIS branch with cond_image=None, `torch.zeros_like(pred_x0[:, :, 0])`
    (ddim.py:571-572) is 4-D while the mask is 5-D, and `torch.where`
    broadcast-inflates the frame axis by ×C — the returned pred_x0 is
    shape-corrupted ([1,C,C·F,h,w] instead of [1,C,F,h,w]). x_prev is
    computed before injection and stays correct. moca_tpu injects
    correctly-shaped zeros instead (sampling/moca.py, DECISIONS)."""
    ref_ddim = _load_ddim_sampler()
    monkeypatch.chdir(tmp_path)
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, use_scale=False)
    sampler = _make_sampler(ref_ddim, sch)

    x, eps, masks, _ = _inputs(seed=0, constant_masks=True)
    indices = np.array([1, 3, 5, 7])
    ts = np.asarray(sch.ddim_timesteps)[indices]

    import torch

    x_t = torch.from_numpy(np.moveaxis(x, -1, 1)).contiguous()
    e_t = torch.from_numpy(np.moveaxis(eps, -1, 1)).contiguous()
    m_t = torch.from_numpy(masks[:, :, :, :, 0].copy()).unsqueeze(1)
    with torch.no_grad():
        x_prev_t, pred_x0_t = sampler.ddim_step(
            x_t, e_t, list(indices), None, None, ts, gamma=0.5,
            davis_masks=m_t)
    assert tuple(pred_x0_t.shape) == (1, C, C * F, H, W)  # the bug
    assert tuple(x_prev_t.shape) == (1, C, F, H, W)

    # x_prev (the tensor the FIFO queue consumes) still matches ours, and
    # our pred_x0 keeps its proper shape with zeros injected in the mask
    x_prev_f, pred_x0_f = moca_window_step(
        sch, MoCAConfig(gamma=0.5), jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray(indices, jnp.int32), jnp.asarray(ts, jnp.int32),
        jax.random.PRNGKey(0), cond_image=None, masks=jnp.asarray(masks),
        masks_are_davis=True, gamma=jnp.float32(0.5))
    np.testing.assert_allclose(
        np.asarray(x_prev_f), np.moveaxis(x_prev_t.numpy(), 1, -1),
        atol=2e-5, rtol=1e-5)
    assert pred_x0_f.shape == (1, F, H, W, C)
    inside = np.asarray(pred_x0_f)[0][masks[0, :, :, :, 0] > 0.5]
    np.testing.assert_array_equal(inside, np.zeros_like(inside))


def test_ddim_step_oracle_momentum_only(tmp_path, monkeypatch):
    """No masks, all t>300 (so neither injection branch fires): the
    momentum-corrected DDIM math matches the real torch loop exactly, and
    disabling our momentum breaks the match (the test has teeth)."""
    ref_ddim = _load_ddim_sampler()
    monkeypatch.chdir(tmp_path)
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, use_scale=False)
    sampler = _make_sampler(ref_ddim, sch)

    x, eps, _, _ = _inputs(seed=1)
    indices = np.array([3, 5, 6, 7])
    ts = np.asarray(sch.ddim_timesteps)[indices]
    assert (ts > 300).all()

    x_prev_ref, pred_x0_ref = _ref_step(
        sampler, x, eps, indices, ts, None, None, 0.0)
    x_prev_f, pred_x0_f = moca_window_step(
        sch, MoCAConfig(gamma=0.0), jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray(indices, jnp.int32), jnp.asarray(ts, jnp.int32),
        jax.random.PRNGKey(0), gamma=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(x_prev_f), x_prev_ref,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_x0_f), pred_x0_ref,
                               atol=2e-5, rtol=1e-5)

    x_prev_off, _ = moca_window_step(
        sch, MoCAConfig(gamma=0.0, enable_momentum=False), jnp.asarray(x),
        jnp.asarray(eps), jnp.asarray(indices, jnp.int32),
        jnp.asarray(ts, jnp.int32), jax.random.PRNGKey(0),
        gamma=jnp.float32(0.0))
    assert not np.allclose(np.asarray(x_prev_off), x_prev_ref, atol=1e-4)


def test_reference_mask_index_corruption(tmp_path, monkeypatch):
    """Characterize the reference bug exactly: with per-frame masks, the
    real ddim_step injects mask[len(X)−1] (= H//4 − 1) for every frame
    after the first — reproduce the reference output by feeding OUR
    implementation the corrupted mask sequence."""
    ref_ddim = _load_ddim_sampler()
    monkeypatch.chdir(tmp_path)
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, use_scale=False)
    sampler = _make_sampler(ref_ddim, sch)

    x, eps, masks, cond = _inputs(seed=2, constant_masks=False)
    indices = np.array([1, 3, 5, 7])
    ts = np.asarray(sch.ddim_timesteps)[indices]

    _, pred_x0_ref = _ref_step(sampler, x, eps, indices, ts, cond, masks,
                               0.0)

    corrupt_idx = H // 4 - 1  # len(np.mgrid[0:H:4]) − 1 (ddim.py:477 etc.)
    corrupted = masks.copy()
    corrupted[:, 1:] = masks[:, corrupt_idx : corrupt_idx + 1]
    _, pred_x0_corr = moca_window_step(
        sch, MoCAConfig(gamma=0.0), jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray(indices, jnp.int32), jnp.asarray(ts, jnp.int32),
        jax.random.PRNGKey(0), cond_image=jnp.asarray(cond),
        masks=jnp.asarray(corrupted), masks_are_davis=True,
        gamma=jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(pred_x0_corr), pred_x0_ref,
                               atol=2e-5, rtol=1e-5)

    # ...and the CORRECT per-frame masks give a different answer — the
    # divergence moca_tpu deliberately fixes (DECISIONS)
    _, pred_x0_fixed = moca_window_step(
        sch, MoCAConfig(gamma=0.0), jnp.asarray(x), jnp.asarray(eps),
        jnp.asarray(indices, jnp.int32), jnp.asarray(ts, jnp.int32),
        jax.random.PRNGKey(0), cond_image=jnp.asarray(cond),
        masks=jnp.asarray(masks), masks_are_davis=True,
        gamma=jnp.float32(0.0))
    assert not np.allclose(np.asarray(pred_x0_fixed), pred_x0_ref, atol=1e-3)


@pytest.mark.parametrize("use_scale,uc_type", [
    (False, None),
    (True, None),            # the VideoCrafter2 use_scale correction
    (False, "cfg_original"),
    (False, "cfg_ours"),
])
def test_p_sample_ddim_oracle(tmp_path, monkeypatch, use_scale, uc_type):
    """The real torch `p_sample_ddim` (ddim.py:273-359) vs our
    `ddim_step_math` + CFG combine — including the use_scale latent
    rescale (ddim.py:349-355) against the actual reference code (our
    prior coverage was closed-form only). apply_model is stubbed with a
    deterministic eps per conditioning (eta=0 → no noise)."""
    ref_ddim = _load_ddim_sampler()
    import torch

    from moca_tpu.sampling.ddim import ddim_step_math, make_cfg_eps_fn

    monkeypatch.chdir(tmp_path)
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0,
                        use_scale=use_scale, scale_b=0.7)
    model = types.SimpleNamespace(
        num_timesteps=1000,
        alphas_cumprod=torch.from_numpy(np.asarray(sch.alphas_cumprod)),
        betas=torch.from_numpy(np.asarray(sch.betas)),
        alphas_cumprod_prev=torch.from_numpy(
            np.asarray(sch.alphas_cumprod_prev)),
        device="cpu",
        use_scale=use_scale,
        scale_arr=torch.from_numpy(np.asarray(sch.scale_arr)),
    )
    sampler = ref_ddim.DDIMSampler(model, use_self_attention=True)
    sampler.register_buffer = types.MethodType(
        lambda self, name, attr: setattr(self, name, attr), sampler)
    sampler.make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, verbose=False)

    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, F, H, W, C)).astype(np.float32)
    eps_c = rng.standard_normal((1, F, H, W, C)).astype(np.float32) * 0.3
    eps_u = rng.standard_normal((1, F, H, W, C)).astype(np.float32) * 0.3
    guidance = 7.5
    index = 5
    t = int(np.asarray(sch.ddim_timesteps)[index])

    # must be tensors: p_sample_ddim type-dispatches on c (ddim.py:294-301)
    cond_marker, uncond_marker = torch.zeros(1), torch.ones(1)
    eps_c_t = torch.from_numpy(np.moveaxis(eps_c, -1, 1)).contiguous()
    eps_u_t = torch.from_numpy(np.moveaxis(eps_u, -1, 1)).contiguous()

    def apply_model(xx, tt, cc, **kw):
        return eps_c_t if cc is cond_marker else eps_u_t

    model.apply_model = apply_model
    with torch.no_grad():
        x_prev_t, pred_x0_t = sampler.p_sample_ddim(
            torch.from_numpy(np.moveaxis(x, -1, 1)).contiguous(),
            cond_marker, torch.tensor([t]), index,
            unconditional_guidance_scale=guidance,
            unconditional_conditioning=uncond_marker, uc_type=uc_type)
    x_prev_ref = np.moveaxis(x_prev_t.numpy(), 1, -1)
    pred_x0_ref = np.moveaxis(pred_x0_t.numpy(), 1, -1)

    # our side: CFG combine on the same fixed eps pair, then the step math
    if uc_type is None:
        e = eps_u + guidance * (eps_c - eps_u)
    elif uc_type == "cfg_original":
        e = eps_c + guidance * (eps_c - eps_u)
    else:
        e = eps_c + guidance * (eps_u - eps_c)
    # sanity: the combine formulas themselves are oracle-matched through
    # make_cfg_eps_fn elsewhere (tests/test_cfg_variants.py)
    x_prev_f, pred_x0_f = ddim_step_math(
        sch, jnp.asarray(x), jnp.asarray(e), jnp.asarray(index),
        jnp.zeros_like(jnp.asarray(x)))
    np.testing.assert_allclose(np.asarray(x_prev_f), x_prev_ref,
                               atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_x0_f), pred_x0_ref,
                               atol=2e-5, rtol=1e-5)


def test_decode_and_stochastic_encode_oracle(tmp_path, monkeypatch):
    """The real torch `DDIMSampler.decode` (ddim.py:674-692) and
    `stochastic_encode` (:651-671) vs `ddim_decode`/`stochastic_encode`.
    apply_model stubbed with an eps that depends on x (so every step's
    chaining is exercised); eta=0 → deterministic."""
    ref_ddim = _load_ddim_sampler()
    import torch

    from moca_tpu.sampling.ddim import ddim_decode, stochastic_encode

    monkeypatch.chdir(tmp_path)
    sch = make_schedule(ddim_num_steps=STEPS, ddim_eta=0.0, use_scale=False)
    sampler = _make_sampler(ref_ddim, sch)

    rng = np.random.default_rng(5)
    x0 = rng.standard_normal((1, F, H, W, C)).astype(np.float32)

    # stochastic_encode with explicit noise (the reference accepts one)
    noise = rng.standard_normal((1, F, H, W, C)).astype(np.float32)
    t_idx = 5
    enc_ref = sampler.stochastic_encode(
        torch.from_numpy(np.moveaxis(x0, -1, 1)).contiguous(),
        torch.tensor([t_idx]),
        noise=torch.from_numpy(np.moveaxis(noise, -1, 1)).contiguous())
    enc_ours = stochastic_encode(sch, jnp.asarray(x0), t_idx,
                                 noise=jnp.asarray(noise))
    np.testing.assert_allclose(
        np.asarray(enc_ours), np.moveaxis(enc_ref.numpy(), 1, -1),
        atol=2e-6)

    # decode: x-dependent eps so each step feeds the next
    def apply_model(xx, tt, cc, **kw):
        return 0.1 * xx + 0.05

    sampler.model.apply_model = apply_model
    t_start = 5
    with torch.no_grad():
        dec_ref = sampler.decode(
            torch.from_numpy(np.moveaxis(x0, -1, 1)).contiguous(),
            torch.zeros(1), t_start)
    eps_fn = lambda xx, tf: 0.1 * xx + 0.05
    dec_ours = ddim_decode(eps_fn, sch, jnp.asarray(x0), t_start,
                           jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(dec_ours), np.moveaxis(dec_ref.numpy(), 1, -1),
        atol=2e-5, rtol=1e-5)
