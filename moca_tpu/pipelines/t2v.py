"""Base text-to-video pipeline: prompt → CLIP → scan(DDIM) → VAE decode.

Covers the reference's `base_ddim_sampling` / `batch_ddim_sampling`
(ref: scripts/evaluation/funcs.py:120-241) and the FreeInit iteration loop
(the reference ships freeinit_utils but only exercises the mix at FIFO shift
time; the full FreeInit re-sampling loop is provided here as
`sample_with_freeinit` for the T2V+FreeInit benchmark config).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from moca_tpu import freeinit
from moca_tpu.models.latent_diffusion import LatentDiffusion
from moca_tpu.sampling.ddim import ddim_sample, make_cfg_eps_fn
from moca_tpu.schedule import DiffusionSchedule, make_schedule
from moca_tpu.xla_opts import tuned_jit


@dataclasses.dataclass(eq=False)  # eq=False: hashable by id for jit statics
class T2VPipeline:
    model: LatentDiffusion
    sch: DiffusionSchedule
    tokenizer: object
    guidance_scale: float = 12.0  # videocrafter_main.py:251
    fps: int = 10
    uc_type: object = None               # ddim.py:303-311 CFG variants
    temporal_cfg_scale: object = None    # funcs.py:121 temporal guidance
    uncond_type: str = "empty_seq"       # ddpm3d.py:397; funcs.py:128-134
    # jax.sharding.Mesh → shard the 2·B-row CFG/prompt batch (and the decode
    # batch) over the devices: in-process multi-chip for --bs batched T2V,
    # replacing the reference's one-process-per-GPU contiguous prompt split
    # (inference.py:71-77 + ddp_wrapper.py). Batches that don't tile the
    # mesh (e.g. B=1 → 2 rows on 8 chips) pass through unsharded.
    mesh: object = None

    @classmethod
    def build(cls, model, tokenizer, num_steps: int = 50, eta: float = 1.0,
              use_scale: bool = True, guidance_scale: float = 12.0,
              fps: int = 10, uc_type=None, temporal_cfg_scale=None,
              uncond_type: str = "empty_seq", mesh=None, **sched_kw):
        # num_steps ≤ 0 selects ancestral DDPM sampling (inference.py:28);
        # the DDIM buffers still need a valid length for the schedule pytree
        sch = make_schedule(ddim_num_steps=max(num_steps, 1), ddim_eta=eta,
                            use_scale=use_scale, **sched_kw)
        return cls(model, sch, tokenizer, guidance_scale, fps,
                   uc_type=uc_type, temporal_cfg_scale=temporal_cfg_scale,
                   uncond_type=uncond_type, mesh=mesh)

    def _unet_apply(self):
        """model.apply_unet, batch-sharded over the mesh when one is set."""
        if self.mesh is None:
            return self.model.apply_unet
        from moca_tpu.parallel.mesh import make_sharded_unet_apply
        return make_sharded_unet_apply(
            self.model.apply_unet, self.mesh, batch_axes=("dp", "fifo"),
            skip_indivisible=True)

    # ------------------------------------------------------------------
    @functools.partial(tuned_jit, static_argnums=(0,))
    def _encode_tokens(self, clip_params, tokens):
        return self.model.encode_tokens(tokens, params=clip_params)

    def encode_prompts(self, prompts: Sequence[str]) -> jnp.ndarray:
        tokens = jnp.asarray(self.tokenizer(list(prompts)))
        return self._encode_tokens(self.model.clip_params, tokens)

    def uncond_context(self, batch: int,
                       like: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Unconditional CFG context: empty-prompt embedding
        (uncond_type='empty_seq', funcs.py:199-216) or zeros shaped like
        the cond context ('zero_embed', funcs.py:128-134; the only two
        values ddpm3d.py:397 admits)."""
        if self.uncond_type == "zero_embed":
            if like is not None:
                return jnp.zeros((batch,) + like.shape[1:], like.dtype)
            return jnp.zeros(
                (batch, 77, self.model.unet_cfg.context_dim), jnp.float32)
        if self.uncond_type != "empty_seq":
            raise NotImplementedError(self.uncond_type)
        return self.encode_prompts([""] * batch)

    # ------------------------------------------------------------------
    @functools.partial(tuned_jit, static_argnums=(0, 4))
    def _sample_latents(self, params, contexts, key, shape):
        # params is an explicit argument: closing over the 1.4B weight tree
        # would embed it in the HLO (fatal for axon's remote compiler).
        ctx, uc = contexts
        eps_fn = make_cfg_eps_fn(
            self._unet_apply(), params,
            ctx, uc, self.guidance_scale, fps=self.fps,
            uc_type=self.uc_type,
            temporal_guidance_scale=self.temporal_cfg_scale)
        return ddim_sample(eps_fn, self.sch, shape, key)

    def sample_latents(
        self, prompt, key: jax.Array,
        latent_shape: Tuple[int, int, int] = (40, 64, 4), frames: int = 16,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (clean_latents, initial_noise) — both cached by the MoCA
        pipeline (the reference saves 0.pt / {S}.pt, ddim.py:233-250).

        prompt: one string or a sequence of B prompts — B>1 samples all
        prompts in ONE batched scan (noise shared across the batch, see
        ddim.shared_normal: bit-identical to B separate runs)."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        ctx = self.encode_prompts(prompts)
        uc = (self.uncond_context(len(prompts), like=ctx)
              if self.guidance_scale != 1.0 else None)
        h, w, c = latent_shape
        shape = (len(prompts), frames, h, w, c)
        return self._sample_latents(self.model.unet_params, (ctx, uc), key,
                                    shape)

    @functools.partial(tuned_jit, static_argnums=(0,))
    def _decode(self, vae_params, latents):
        """Batched VAE decode ([B,T,h,w,4] → [B,T,H,W,3], clipped).

        Under a mesh the FLATTENED B·T frame rows are sharded, not the
        prompt axis: with --bs 4 on 8 chips the 4-row prompt batch can't
        tile the mesh, but its 64 per-frame decodes can (the VAE is 2D
        per-frame — decode_first_stage_2DAE, ddpm3d.py:556-562)."""
        b, t = latents.shape[:2]
        flat = latents.reshape((b * t,) + latents.shape[2:])
        if self.mesh is not None and flat.shape[0] % self.mesh.size == 0:
            from moca_tpu.parallel.mesh import shard_batch
            flat = jax.lax.with_sharding_constraint(
                flat, shard_batch(self.mesh, axes=("dp", "fifo")))
        x = self.model.decode_single(flat, params=vae_params)
        return jnp.clip(x.reshape((b, t) + x.shape[1:]), -1.0, 1.0)

    def sample_latents_from_context(
        self, ctx: jnp.ndarray, uc: Optional[jnp.ndarray], key: jax.Array,
        latent_shape: Tuple[int, int, int] = (40, 64, 4), frames: int = 16,
    ):
        """Sample with a pre-built context (e.g. text‖image token concat for
        the i2v variant, inference.py:110-117). Batch = ctx rows."""
        h, w, c = latent_shape
        return self._sample_latents(
            self.model.unet_params, (ctx, uc), key,
            (ctx.shape[0], frames, h, w, c))

    @functools.partial(tuned_jit, static_argnums=(0, 4))
    def _sample_latents_ddpm(self, params, contexts, key, shape):
        """Ancestral DDPM sampling (the reference's ddim_steps≤0 path,
        inference.py:28)."""
        from moca_tpu.sampling.ddpm import ddpm_sample

        ctx, uc = contexts
        eps_fn = make_cfg_eps_fn(
            self._unet_apply(), params, ctx, uc, self.guidance_scale,
            fps=self.fps, uc_type=self.uc_type,
            temporal_guidance_scale=self.temporal_cfg_scale)
        return ddpm_sample(eps_fn, self.sch, shape, key)

    def __call__(self, prompt, key: jax.Array,
                 height: int = 320, width: int = 512, frames: int = 16,
                 image_tokens: Optional[jnp.ndarray] = None,
                 use_ddpm: bool = False):
        """prompt → video frames [T, H, W, 3] float in [-1, 1].

        prompt: one string, or a sequence of B prompts sampled in ONE
        batched DDIM scan (the reference's --bs batching,
        inference.py:30,92-101; noise is shared across the batch like its
        same-seed DDP ranks) — returns [B, T, H, W, 3] for a sequence.
        image_tokens: optional [B, N, context_dim] i2v tokens appended to
        the text context (and zero-image tokens to the uncond context,
        matching batch_ddim_sampling's uc_img, funcs.py:136-141); a
        [1, N, D] token block broadcasts over the prompt batch.
        use_ddpm: full ancestral sampling instead of DDIM."""
        single = isinstance(prompt, str)
        prompts = [prompt] if single else list(prompt)
        b = len(prompts)
        ctx = self.encode_prompts(prompts)
        uc = (self.uncond_context(b, like=ctx)
              if self.guidance_scale != 1.0 else None)
        if image_tokens is not None:
            if image_tokens.shape[0] != b:
                image_tokens = jnp.broadcast_to(
                    image_tokens, (b,) + image_tokens.shape[1:])
            ctx = jnp.concatenate([ctx, image_tokens], axis=1)
            if uc is not None:
                uc = jnp.concatenate(
                    [uc, jnp.zeros_like(image_tokens)], axis=1)
        shape = (b, frames, height // 8, width // 8, 4)
        if use_ddpm:
            latents = self._sample_latents_ddpm(
                self.model.unet_params, (ctx, uc), key, shape)
        else:
            latents, _ = self.sample_latents_from_context(
                ctx, uc, key, latent_shape=shape[2:], frames=frames)
        decoded = self._decode(self.model.vae_params, latents)
        return decoded[0] if single else decoded

    # ------------------------------------------------------------------
    def sample_with_freeinit(
        self, prompt: str, key: jax.Array, iterations: int = 3,
        height: int = 320, width: int = 512, frames: int = 16,
        filter_type: str = "gaussian", d_s: float = 0.25, d_t: float = 0.25,
    ):
        """FreeInit: iteratively re-noise the sampled latent, keeping its low
        frequencies and refreshing high frequencies, then re-sample
        (FreeInit paper loop; mix math = utils/freeinit_utils.py:7-47)."""
        h, w = height // 8, width // 8
        shape = (1, frames, h, w, 4)
        ctx = self.encode_prompts([prompt])
        uc = (self.uncond_context(1, like=ctx)
              if self.guidance_scale != 1.0 else None)

        key, k0 = jax.random.split(key)
        latents, _ = self._sample_latents(self.model.unet_params, (ctx, uc),
                                          k0, shape)
        lpf = freeinit.get_freq_filter((frames, h, w), filter_type, 1, d_s, d_t)
        for _ in range(iterations - 1):
            # four-way split: reusing one key for both the freq-mix noise and
            # the DDIM σ-noise stream would correlate them
            key, k_noise, k_mix, k_samp = jax.random.split(key, 4)
            # diffuse the clean latent to the terminal noise level, then
            # freq-mix with fresh noise: [B,T,h,w,C] → fft over (T,h,w)
            noise = jax.random.normal(k_noise, latents.shape, jnp.float32)
            a_T = self.sch.alphas_cumprod[self.sch.ddim_timesteps[-1]]
            noised = jnp.sqrt(a_T) * latents + jnp.sqrt(1 - a_T) * noise
            x = jnp.moveaxis(noised, -1, 1)   # [B,C,T,h,w]
            n = jnp.moveaxis(
                jax.random.normal(k_mix, latents.shape, jnp.float32), -1, 1)
            mixed = freeinit.freq_mix_3d(x, n, lpf)
            x_T = jnp.moveaxis(mixed, 1, -1)
            latents, _ = ddim_from_xt(self, (ctx, uc), x_T, key=k_samp)
        return self._decode(self.model.vae_params, latents)[0]


@functools.partial(tuned_jit, static_argnums=(0,))
def _ddim_from_xt_jit(pipe: T2VPipeline, params, contexts, x_T, key):
    ctx, uc = contexts
    # full CFG-variant set: FreeInit re-sampling iterations must guide
    # exactly like the first draw (the reference re-enters sampler.sample
    # with the same uc_type/temporal args every iteration)
    eps_fn = make_cfg_eps_fn(
        pipe._unet_apply(), params,
        ctx, uc, pipe.guidance_scale, fps=pipe.fps, uc_type=pipe.uc_type,
        temporal_guidance_scale=pipe.temporal_cfg_scale)
    return ddim_sample(eps_fn, pipe.sch, x_T.shape, key, x_T=x_T)


def ddim_from_xt(pipe: T2VPipeline, contexts, x_T, key=None):
    if key is None:
        key = jax.random.PRNGKey(0)
    return _ddim_from_xt_jit(pipe, pipe.model.unet_params, contexts, x_T, key)
