"""DDPM ancestral sampler math vs closed form."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu import schedule
from moca_tpu.sampling import ddpm


@pytest.fixture(scope="module")
def sch():
    return schedule.make_schedule(ddim_num_steps=10, num_timesteps=50,
                                  use_scale=False)


def test_q_sample_endpoints(sch):
    x0 = jnp.ones((1, 2, 4, 4, 2))
    noise = jnp.zeros_like(x0)
    # t=0: almost no noise
    out = ddpm.q_sample(sch, x0, jnp.int32(0), noise)
    np.testing.assert_allclose(
        np.asarray(out), float(jnp.sqrt(sch.alphas_cumprod[0])), rtol=1e-5)


def test_q_sample_use_scale():
    sch = schedule.make_schedule(ddim_num_steps=10, num_timesteps=50,
                                 use_scale=True, mid_step=20)
    x0 = jnp.ones((1, 2, 4, 4, 2))
    noise = jnp.zeros_like(x0)
    t = jnp.int32(5)
    out = ddpm.q_sample(sch, x0, t, noise)
    want = float(sch.sqrt_alphas_cumprod[5] * sch.scale_arr[5])
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_predict_start_roundtrip(sch):
    """q_sample then predict_start_from_noise recovers x0."""
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 2, 4, 4, 2))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.int32(20)
    x_t = ddpm.q_sample(sch, x0, t, noise, use_scale=False)
    rec = ddpm.predict_start_from_noise(sch, x_t, t, noise)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-4)


def test_q_posterior_t0_variance_zero(sch):
    x0 = jnp.ones((1, 2, 4, 4, 2))
    mean, var, _ = ddpm.q_posterior(sch, x0, x0, jnp.int32(0))
    assert float(var.max()) < 1e-6


def test_ddpm_sample_runs_and_is_deterministic(sch):
    def eps_fn(x, t):
        return x * 0.05

    out1 = ddpm.ddpm_sample(eps_fn, sch, (1, 2, 4, 4, 2),
                            jax.random.PRNGKey(3))
    out2 = ddpm.ddpm_sample(eps_fn, sch, (1, 2, 4, 4, 2),
                            jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_ddpm_sample_x0_parameterization(sch):
    def x0_fn(x, t):
        return jnp.zeros_like(x)  # model always predicts x0 = 0

    out = ddpm.ddpm_sample(x0_fn, sch, (1, 2, 4, 4, 2),
                           jax.random.PRNGKey(4), parameterization="x0")
    # posterior pulls toward predicted x0=0; final sample should be small
    assert float(jnp.abs(out).mean()) < 0.5
