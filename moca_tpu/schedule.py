"""Diffusion schedule numerics (pure functions, CPU- and TPU-runnable).

Re-implements the schedule math of the reference pipeline:
  * beta schedules            (ref: lvdm/models/utils_diffusion.py:31-53)
  * DDIM timestep selection   (ref: lvdm/models/utils_diffusion.py:56-78)
  * DDIM sampling parameters  (ref: lvdm/models/utils_diffusion.py:81-93)
  * VideoCrafter2 `use_scale` latent rescale ramp (ref: lvdm/models/ddpm3d.py:362-376)
  * sinusoidal timestep embedding (ref: lvdm/models/utils_diffusion.py:8-28)

Everything is computed once in float64/float32 NumPy at setup time and bundled
into a `DiffusionSchedule` pytree of jnp arrays, so the sampler's jitted step
functions just gather from constant buffers.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedule, float64 like the reference (utils_diffusion.py:31-53)."""
    if schedule == "linear":
        betas = (
            np.linspace(linear_start**0.5, linear_end**0.5, n_timestep, dtype=np.float64)
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, 0, 0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def make_ddim_timesteps(
    ddim_discr_method: str, num_ddim_timesteps: int, num_ddpm_timesteps: int
) -> np.ndarray:
    """DDIM timestep subset (utils_diffusion.py:56-78).

    'uniform' is `np.linspace(0, T-1, S).round()` — NOT the classic `range(0,T,c)`.
    """
    if ddim_discr_method == "uniform":
        steps = (
            np.linspace(0, num_ddpm_timesteps - 1, num_ddim_timesteps)
            .round()
            .astype(np.int64)
        )
        return steps
    elif ddim_discr_method == "quad":
        steps = (
            np.linspace(0, np.sqrt(num_ddpm_timesteps * 0.8), num_ddim_timesteps) ** 2
        ).astype(int)
        return steps + 1
    raise NotImplementedError(f"unknown ddim discretization '{ddim_discr_method}'")


def make_ddim_sampling_parameters(
    alphacums: np.ndarray, ddim_timesteps: np.ndarray, eta: float
):
    """Per-DDIM-step (sigma, alpha, alpha_prev) (utils_diffusion.py:81-93)."""
    alphas = alphacums[ddim_timesteps]
    alphas_prev = np.concatenate([alphacums[:1], alphacums[ddim_timesteps[:-1]]])
    sigmas = eta * np.sqrt(
        (1 - alphas_prev) / (1 - alphas) * (1 - alphas / alphas_prev)
    )
    return sigmas, alphas, alphas_prev


def make_scale_arr(
    num_timesteps: int,
    scale_a: float = 1.0,
    scale_b: float = 0.7,
    mid_step: int = 400,
    fix_scale_bug: bool = False,
) -> np.ndarray:
    """VideoCrafter2 latent rescale ramp (ddpm3d.py:362-376).

    Ramps scale_a→scale_b over the first `mid_step` timesteps, then holds
    scale_b. The reference has an off-by-length "bug" (scale_step =
    num_timesteps instead of num_timesteps - mid_step) that makes the array
    longer than num_timesteps; only the first num_timesteps entries are ever
    indexed, so we truncate — numerically identical behavior.
    """
    scale_step = (num_timesteps - mid_step) if fix_scale_bug else num_timesteps
    arr = np.concatenate(
        [np.linspace(scale_a, scale_b, mid_step), np.full(scale_step, scale_b)]
    )
    return arr[:num_timesteps].astype(np.float64)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embedding, [cos | sin] order (utils_diffusion.py:8-28).

    Note the reference concatenates cos FIRST then sin (unlike most DDPM
    codebases); checkpoint-converted weights depend on this order.

    Args:
      timesteps: any shape of (possibly fractional) timestep values.
      dim: embedding dimension.
    Returns:
      timesteps.shape + (dim,) float32 embedding.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[..., None] * freqs
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[..., :1])], axis=-1)
    return emb


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    """All DDPM + DDIM schedule buffers as one pytree of jnp.float32 arrays.

    Gathers replace the reference's per-step `torch.full(...)` constructions
    (ddim.py:332-336) so a single jitted step works for any step index.
    """

    # DDPM buffers, length = num_timesteps (ddpm3d.py:113-165)
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    scale_arr: jnp.ndarray  # ones when use_scale=False

    # DDIM buffers, length = num ddim steps (ddim.py:62-106)
    ddim_timesteps: jnp.ndarray  # int32
    ddim_alphas: jnp.ndarray
    ddim_alphas_prev: jnp.ndarray
    ddim_sigmas: jnp.ndarray
    ddim_sqrt_one_minus_alphas: jnp.ndarray
    ddim_scale_arr: jnp.ndarray
    ddim_scale_arr_prev: jnp.ndarray

    use_scale: bool = dataclasses.field(metadata=dict(static=True), default=True)

    @property
    def num_ddim_steps(self) -> int:
        return self.ddim_timesteps.shape[0]

    @property
    def num_timesteps(self) -> int:
        return self.betas.shape[0]


def make_schedule(
    ddim_num_steps: int,
    num_timesteps: int = 1000,
    beta_schedule: str = "linear",
    linear_start: float = 0.00085,
    linear_end: float = 0.012,
    cosine_s: float = 8e-3,
    ddim_discretize: str = "uniform",
    ddim_eta: float = 1.0,
    use_scale: bool = True,
    scale_a: float = 1.0,
    scale_b: float = 0.7,
    mid_step: int = 400,
    fix_scale_bug: bool = False,
) -> DiffusionSchedule:
    """Build the full schedule (defaults = configs/inference_t2v_512_v2.0.yaml).

    Mirrors DDPM.register_schedule (ddpm3d.py:113-165) + DDIMSampler.make_schedule
    (ddim.py:62-106) in one shot.
    """
    betas = make_beta_schedule(
        beta_schedule, num_timesteps, linear_start, linear_end, cosine_s
    )
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    ddim_ts = make_ddim_timesteps(ddim_discretize, ddim_num_steps, num_timesteps)
    sigmas, ddim_alphas, ddim_alphas_prev = make_ddim_sampling_parameters(
        alphas_cumprod, ddim_ts, ddim_eta
    )

    if use_scale:
        scale_arr = make_scale_arr(num_timesteps, scale_a, scale_b, mid_step, fix_scale_bug)
    else:
        scale_arr = np.ones(num_timesteps, dtype=np.float64)
    # ddim.py:83-86: gather at ddim timesteps; prev is [scale_arr[0]] + gathered[:-1]
    ddim_scale_arr = scale_arr[ddim_ts]
    ddim_scale_arr_prev = np.concatenate([scale_arr[:1], scale_arr[ddim_ts[:-1]]])

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return DiffusionSchedule(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        scale_arr=f32(scale_arr),
        ddim_timesteps=jnp.asarray(ddim_ts, dtype=jnp.int32),
        ddim_alphas=f32(ddim_alphas),
        ddim_alphas_prev=f32(ddim_alphas_prev),
        ddim_sigmas=f32(sigmas),
        ddim_sqrt_one_minus_alphas=f32(np.sqrt(1.0 - ddim_alphas)),
        ddim_scale_arr=f32(ddim_scale_arr),
        ddim_scale_arr_prev=f32(ddim_scale_arr_prev),
        use_scale=use_scale,
    )
