"""Oracle parity for utils/distributions.py and utils/ema.py against the
reference's actual DiagonalGaussianDistribution (lvdm/distributions.py:24-65)
and LitEma (lvdm/ema.py:5-76) under CPU torch, plus the EMA checkpoint-name
round trip through models/convert.extract_ema_weights."""

from __future__ import annotations

import numpy as np
import pytest

from moca_tpu.models import convert
from moca_tpu.utils import distributions, ema
from tests.oracle import load_reference

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def _posterior(ref, mean, logvar):
    torch = ref.torch
    params = torch.from_numpy(np.concatenate([mean, logvar], axis=1))
    import lvdm.distributions as ref_dist

    return ref_dist.DiagonalGaussianDistribution(params), torch


def test_distributions_kl_nll_mode_oracle():
    ref = load_reference()
    rng = np.random.default_rng(0)
    mean = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    # include values outside the clamp range to exercise clip(-30, 20)
    logvar = rng.uniform(-40.0, 25.0, size=(2, 4, 5, 6)).astype(np.float32)
    x = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    post, torch = _posterior(ref, mean, logvar)

    np.testing.assert_allclose(
        np.asarray(distributions.kl(jnp.asarray(mean), jnp.asarray(logvar))),
        post.kl().numpy(), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(distributions.nll(jnp.asarray(mean), jnp.asarray(logvar),
                                     jnp.asarray(x))),
        post.nll(torch.from_numpy(x)).numpy(), rtol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(distributions.mode(jnp.asarray(mean), jnp.asarray(logvar))),
        post.mode().numpy())


def test_distributions_kl_other_oracle():
    ref = load_reference()
    rng = np.random.default_rng(1)
    shp = (3, 4, 2, 2)
    m1, m2 = (rng.normal(size=shp).astype(np.float32) for _ in range(2))
    lv1, lv2 = (rng.uniform(-3, 3, size=shp).astype(np.float32)
                for _ in range(2))
    p1, torch = _posterior(ref, m1, lv1)
    p2, _ = _posterior(ref, m2, lv2)
    np.testing.assert_allclose(
        np.asarray(distributions.kl(jnp.asarray(m1), jnp.asarray(lv1),
                                    other=(jnp.asarray(m2), jnp.asarray(lv2)))),
        p1.kl(other=p2).numpy(), rtol=1e-5)


def test_distributions_sample_matches_reference_with_same_noise():
    """ref sample(noise) = mean + std*noise; ours must agree given the noise
    our key generates (std computed under the same logvar clamp)."""
    ref = load_reference()
    rng = np.random.default_rng(2)
    mean = rng.normal(size=(1, 4, 3, 3)).astype(np.float32)
    logvar = rng.uniform(-35.0, 22.0, size=(1, 4, 3, 3)).astype(np.float32)
    post, torch = _posterior(ref, mean, logvar)

    key = jax.random.PRNGKey(7)
    ours = np.asarray(
        distributions.sample(jnp.asarray(mean), jnp.asarray(logvar), key))
    noise = np.asarray(jax.random.normal(key, mean.shape, jnp.float32))
    theirs = post.sample(noise=torch.from_numpy(noise)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _torch_model(ref, seed=0):
    torch = ref.torch
    torch.manual_seed(seed)
    m = torch.nn.Sequential(
        torch.nn.Conv2d(3, 4, 3), torch.nn.SiLU(), torch.nn.Linear(5, 7))
    return m, torch


@pytest.mark.parametrize("use_num_updates", [True, False])
def test_ema_update_oracle(use_num_updates):
    ref = load_reference()
    model, torch = _torch_model(ref)
    from lvdm.ema import LitEma

    lit = LitEma(model, decay=0.99, use_num_upates=use_num_updates)
    names = [n for n, p in model.named_parameters() if p.requires_grad]
    # .copy(): jnp.asarray zero-copy-aliases numpy views of torch storage
    # on CPU, and the in-place p.add_ below would mutate the snapshot.
    state = ema.EMAState.create(
        {n: jnp.asarray(p.detach().numpy().copy()) for n, p in
         model.named_parameters()})

    g = np.random.default_rng(3)
    for step in range(4):
        with torch.no_grad():
            for p in model.parameters():
                p.add_(torch.from_numpy(
                    g.normal(size=p.shape).astype(np.float32)) * 0.1)
        lit(model)
        state = ema.ema_update(
            state,
            {n: jnp.asarray(p.detach().numpy().copy())
             for n, p in model.named_parameters()},
            decay=0.99, use_num_updates=use_num_updates)
        shadow = dict(lit.named_buffers())
        for n in names:
            np.testing.assert_allclose(
                np.asarray(state.params[n]),
                shadow[lit.m_name2s_name[n]].numpy(),
                rtol=1e-5, atol=1e-6,
                err_msg=f"step {step} param {n}")


def test_extract_ema_weights_roundtrip():
    """LitEma's dot-stripped shadow names must map back to the dotted
    model.* keys through convert.extract_ema_weights."""
    ref = load_reference()
    model, torch = _torch_model(ref, seed=1)
    from lvdm.ema import LitEma

    class Wrapper(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.model = model
            self.model_ema = LitEma(model)

    w = Wrapper()
    with torch.no_grad():
        for p in model.parameters():
            p.mul_(2.0)
    w.model_ema(model)
    sd = {k: v.numpy() for k, v in w.state_dict().items()}
    out = convert.extract_ema_weights(sd)
    shadow = dict(w.model_ema.named_buffers())
    assert set(out) == {
        "model." + n for n, p in model.named_parameters() if p.requires_grad}
    for n, p in model.named_parameters():
        np.testing.assert_array_equal(
            out["model." + n],
            shadow[w.model_ema.m_name2s_name[n]].numpy())


def test_extract_ema_weights_rejects_unknown_shadow():
    with pytest.raises(KeyError):
        convert.extract_ema_weights(
            {"model.a.b": np.zeros(1), "model_ema.zz": np.zeros(1)})
