"""Golden regression: fixed-seed MoCA window step snapshot.

Catches silent numerical drift in the DDIM math / momentum / injection /
γ-blend chain (the reference 'tests' by golden-artifact inspection —
SURVEY §4; this is the deterministic equivalent). Values generated on CPU
f32 with jax_default_matmul_precision=highest (conftest).
"""

import numpy as np
import jax
import jax.numpy as jnp

from moca_tpu import schedule
from moca_tpu.sampling.moca import MoCAConfig, moca_window_step

GOLDEN_XP = [-1.758034348487854, -0.3914327621459961,
             1.1443405151367188, 0.4402821660041809]
GOLDEN_P0 = [0.17109175026416779, -0.09942377358675003,
             0.219422847032547, -0.11822903901338577]
GOLDEN_XP_SUM = -4.721033573150635
GOLDEN_P0_SUM = 16.609901428222656


def test_moca_window_step_golden():
    sch = schedule.make_schedule(ddim_num_steps=8, ddim_eta=1.0)
    x = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 4, 4, 2))
    eps = jax.random.normal(jax.random.PRNGKey(11), x.shape) * 0.1
    idx = jnp.arange(4, dtype=jnp.int32)
    ts = jnp.asarray(sch.ddim_timesteps)[idx]
    masks = (jax.random.uniform(jax.random.PRNGKey(12), (1, 4, 4, 4, 1))
             > 0.5).astype(jnp.float32)
    cond = jnp.full((4, 4, 2), 0.25)
    xp, p0 = moca_window_step(sch, MoCAConfig(), x, eps, idx, ts,
                              jax.random.PRNGKey(13), cond_image=cond,
                              masks=masks)
    np.testing.assert_allclose(np.asarray(xp[0, :, 0, 0, 0]), GOLDEN_XP,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p0[0, :, 1, 1, 1]), GOLDEN_P0,
                               rtol=1e-5)
    np.testing.assert_allclose(float(jnp.sum(xp)), GOLDEN_XP_SUM, rtol=1e-4)
    np.testing.assert_allclose(float(jnp.sum(p0)), GOLDEN_P0_SUM, rtol=1e-4)
