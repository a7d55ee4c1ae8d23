"""MoCA-Video pipeline: base sample → FIFO diagonal queue → per-step concept
injection → streaming frame decode.

TPU-first equivalent of `fifo_ddim_sampling` and friends
(ref: scripts/evaluation/funcs.py:243-468, videocrafter_main.py:66-232):

  * the python rank loop + per-rank CUDA U-Net calls become ONE jitted
    `fifo_step` whose window batch is sharded over the device mesh
    (see sampling/fifo.py for the equivalence argument),
  * the per-output-frame python loop stays on host (it performs IO: frame
    decode hand-off, optional mask ingestion), everything inside is jit,
  * latent caching for resume (reference: 0.pt / {S}.pt, ddim.py:233-250,
    videocrafter_main.py:201-209) is npz-based and content-addressed,
  * multi-prompt long video (funcs.py:375-468) = swapping the context
    tensor at frame boundaries — no retrace (context is a traced arg).

RNG layout (explicit, reproducible):
    root ── "base"  : base DDIM sampling
         ── "queue" : diagonal queue preparation
         └─ "fifo"  : per-iteration fold: (moca windows, tail shift)
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moca_tpu.models.latent_diffusion import LatentDiffusion
from moca_tpu.sampling.ddim import make_cfg_eps_fn
from moca_tpu.sampling.fifo import (
    FIFOPlan, fifo_step, make_fifo_plan, prepare_queue, shift_masks,
    shift_queue,
)
from moca_tpu.sampling.moca import MoCAConfig
from moca_tpu.pipelines.t2v import T2VPipeline
from moca_tpu.schedule import make_schedule
from moca_tpu.xla_opts import tuned_jit


@dataclasses.dataclass(eq=False)
class MoCAVideoPipeline:
    """End-to-end semantic mixing. Defaults follow videocrafter_main.py flags."""

    model: LatentDiffusion
    tokenizer: object
    video_length: int = 16            # f (videocrafter_main.py:240)
    num_partitions: int = 4           # n (:241)
    new_video_length: int = 100       # N (:244)
    guidance_scale: float = 12.0      # (:251)
    eta: float = 1.0                  # (:253)
    fps: int = 10                     # (:250)
    lookahead_denoising: bool = True  # (:252)
    moca: MoCAConfig = dataclasses.field(default_factory=MoCAConfig)
    use_scale: bool = True
    mesh: Optional[object] = None  # jax.sharding.Mesh → shard windows on ICI
    decode_batch: int = 8  # head frames decoded per batched VAE call
    # mid-FIFO checkpointing (NEW vs reference — SURVEY §5.4: the reference
    # can only resume from the base-latent cache, not mid-stream): every
    # `checkpoint_every` output frames the queue state is snapshotted; a
    # killed run restarts from the last snapshot.
    checkpoint_every: int = 0  # 0 = off
    # tail refill on shift: "freeinit" = LPF-mixed anchor+noise
    # (funcs.py:86-99, the mainline); "plain" = pure fresh noise
    # (funcs_mp.py:39-46, the multiprocess path's variant).
    tail_mode: str = "freeinit"
    uncond_type: str = "empty_seq"  # ddpm3d.py:397 empty_seq | zero_embed
    # Open-vocab provider scheduling. True (default): iteration i+1 is
    # DISPATCHED before the host synchronizes on iteration i's pred_x0, so
    # the detector runs while the device computes — masks lag TWO
    # iterations (detected at queue slot j, consumed at slot j-2). False:
    # the r3 behavior — synchronize, detect, then dispatch (lag one slot,
    # detector time serializes with device compute). The reference pays the
    # detector inside the denoise loop every frame (ddim.py:592-606).
    seg_async: bool = True

    def __post_init__(self):
        self.num_inference_steps = self.video_length * self.num_partitions
        self.sch = make_schedule(
            ddim_num_steps=self.num_inference_steps, ddim_eta=self.eta,
            use_scale=self.use_scale)
        self.plan: FIFOPlan = make_fifo_plan(
            np.asarray(self.sch.ddim_timesteps), self.video_length,
            self.num_partitions, self.lookahead_denoising)
        self.base = T2VPipeline(
            self.model, self.sch, self.tokenizer,
            guidance_scale=self.guidance_scale, fps=self.fps,
            uncond_type=self.uncond_type, mesh=self.mesh)

    # ------------------------------------------------------------------
    # jitted step: all FIFO windows + MoCA + shift in one compiled graph
    # ------------------------------------------------------------------
    @functools.partial(tuned_jit, static_argnums=(0, 8, 9), donate_argnums=(2,))
    def _fifo_iteration(self, unet_params, latents, contexts, cond_image,
                        masks, gamma, key, masks_are_davis, want_pred=False,
                        anchor=None):
        """(queue, …) → (shifted queue, head latent[, low-t pred_x0]).
        Queue buffer donated.

        want_pred: additionally return the pre-injection pred_x0 for the
        queue slots with t ≤ inject_threshold — the frames the open-vocab
        mask provider segments host-side (ddim.py:592-606).

        unet_params is an explicit argument (closure capture would bake the
        1.4B weight tree into the HLO — axon's remote compiler chokes)."""
        ctx, uc = contexts
        unet_apply = self.model.apply_unet
        if self.mesh is not None:
            from moca_tpu.parallel.mesh import make_sharded_unet_apply
            unet_apply = make_sharded_unet_apply(unet_apply, self.mesh)
        eps_fn = make_cfg_eps_fn(
            unet_apply, unet_params, ctx, uc,
            self.guidance_scale, fps=self.fps)
        k_win, k_shift, k_anchor = jax.random.split(key, 3)
        result = fifo_step(
            eps_fn, self.sch, self.plan, self.moca, latents, k_win,
            cond_image=cond_image, masks=masks,
            masks_are_davis=masks_are_davis, gamma=gamma,
            with_pred_x0=want_pred)
        if want_pred:
            new_latents, head, pred_queue = result
            pred_low = pred_queue[:, : self._num_low_t_slots()]
        else:
            new_latents, head = result
        # DAVIS anchor: fresh posterior sample per shift (the reference
        # re-encodes the last real frame each shift, funcs.py:101-114;
        # moments are precomputed so only the ε-draw happens here)
        anchor_latent = None
        if anchor is not None:
            mean, std = anchor
            anchor_latent = mean + std * jax.random.normal(
                k_anchor, mean.shape, jnp.float32).astype(mean.dtype)
        shifted = shift_queue(new_latents, k_shift, anchor=anchor_latent,
                              tail_mode=self.tail_mode)
        if want_pred:
            return shifted, head, pred_low
        return shifted, head

    def _num_low_t_slots(self) -> int:
        """Queue slots with t ≤ inject_threshold (a contiguous prefix —
        queue noise levels are ascending)."""
        return int(np.sum(self.plan.timesteps <= self.moca.inject_threshold))

    def _pull_masks(self, pred_low, mask_provider, target, counter, hw,
                    lag=1):
        """Host-side open-vocab mask acquisition.

        Mirrors the reference's per-frame sweep (ddim.py:592-606: every
        t≤300 frame is segmented from its pre-injection pred_x0, with
        `pre_masks` state carried across frames — here the provider object
        holds that state). The queue shifts `lag` times between the
        iteration whose pred_x0 is segmented and the iteration that
        consumes the masks, so the mask detected at slot j lands at slot
        j-lag of the consuming queue (slots that shifted out are dropped
        with their frames). lag=1 is the synchronous mode; lag=2 the async
        mode, where this call runs while the device computes the iteration
        in between (see `seg_async`).

        Synchronizes on `pred_low` — in async mode the caller has already
        dispatched the next iteration, so the wait (and the provider's own
        latency) overlaps device compute."""
        from moca_tpu.io.segmentation import latent_to_uint8_frame

        h, w = hw
        k_low = self._num_low_t_slots()
        new_masks = np.zeros((1, self.plan.queue_length, h, w, 1), np.float32)
        pred_np = np.asarray(pred_low)  # [1, k_low, h, w, C]
        for j in range(k_low):
            frame = latent_to_uint8_frame(pred_np[0, j])
            m = mask_provider(counter, frame, target)
            counter += 1
            if m is not None and j >= lag:
                new_masks[0, j - lag, :, :, 0] = np.asarray(m, np.float32)
        return jnp.asarray(new_masks), counter

    @functools.partial(tuned_jit, static_argnums=(0,))
    def _decode_heads(self, vae_params, heads):
        """[K, h, w, 4] stacked head latents → [K, H, W, 3] frames.

        The reference decodes ONE frame per FIFO iteration
        (funcs.py:358-360); batching K decodes into one VAE call keeps the
        MXU busy and amortizes dispatch latency. Under a mesh the head batch
        is sharded over all devices (one frame per chip at the default
        decode_batch=8 on a v5e-8), mirroring funcs_mp.py's per-rank
        decode (funcs_mp.py:221-236) without the process fan-out."""
        if self.mesh is not None and heads.shape[0] % self.mesh.size == 0:
            from moca_tpu.parallel.mesh import shard_batch
            heads = jax.lax.with_sharding_constraint(
                heads, shard_batch(self.mesh, axes=("dp", "fifo")))
        return jnp.clip(
            self.model.decode_single(heads, params=vae_params), -1.0, 1.0)

    # ------------------------------------------------------------------
    def _base_latents(self, prompts, key: jax.Array, latent_hw,
                      latents_dir: Optional[str]) -> jnp.ndarray:
        """Base sampling with the reference's latent cache/resume contract
        (videocrafter_main.py:201-209): skip when cached. With B>1 prompts
        the cache file holds the whole [B, T, h, w, C] batch."""
        cache = None
        if latents_dir:
            os.makedirs(latents_dir, exist_ok=True)
            cache = os.path.join(
                latents_dir, f"{self.num_inference_steps}.npz")
        if cache and os.path.exists(cache):
            data = np.load(cache)
            cached = jnp.asarray(data["latents"])
            if cached.shape[0] == len(prompts):
                return cached
        # self.base already carries the identical schedule
        # (ddim_num_steps=f·n, same eta/use_scale) — reusing it keeps the
        # jitted DDIM scan cached across prompts instead of recompiling.
        latents, x_T = self.base.sample_latents(
            prompts, key, latent_shape=latent_hw + (4,),
            frames=self.video_length)
        if cache:
            np.savez(cache, latents=np.asarray(latents), x_T=np.asarray(x_T))
        return latents

    # ------------------------------------------------------------------
    def __call__(
        self,
        prompt,  # str | Sequence[str]: B>1 = batched-prompt data parallel
        key: jax.Array,
        cond_image: Optional[np.ndarray] = None,   # [h, w, C] latent-res
        conditioned_prompt: Optional[str] = None,  # appended context tokens
        gamma: Optional[float] = None,
        height: int = 320,
        width: int = 512,
        clean_latents: Optional[jnp.ndarray] = None,  # DAVIS: encoded frames
        masks: Optional[np.ndarray] = None,           # [T0, h, w] binary
        davis_frames: Optional[jnp.ndarray] = None,   # [T0, H, W, 3] for anchors
        latents_dir: Optional[str] = None,
        multiprompts: Optional[Sequence[Tuple[str, int]]] = None,
        frame_callback: Optional[Callable[[int, np.ndarray], None]] = None,
        mask_provider: Optional[Callable] = None,     # open-vocab segmentation
        target: Optional[str] = None,                 # detector text prompt
        viz: Optional[object] = None,  # utils.visualization.VisualizationSink
    ) -> List[np.ndarray]:
        """Returns the generated frames as a list of [H, W, 3] float arrays
        in [-1, 1] (length = new_video_length + S - f, like the reference's
        fifo loop, funcs.py:305; callers usually keep a half — see CLI).

        mask_provider: open-vocabulary prompt-mode segmentation (the
        reference runs Grounding-DINO+SAM2 *inside* the denoise loop with a
        GPU→PIL→GPU round trip per frame, ddim.py:592-606,739-903). Here the
        provider — e.g. `io.segmentation.CallbackMaskProvider`, which applies
        the reference's IoU/coverage/prev-mask gates — is called host-side
        once per t≤300 queue slot per iteration with the uint8-converted
        pre-injection pred_x0 (conversion of ddim.py:744-763) and `target`
        (defaults to the prompt, like get_davis_prompt's target). With
        `seg_async` (default) the provider runs while the device computes
        the following iteration and its masks land two iterations later;
        `seg_async=False` serializes detector and device with a
        one-iteration lag. Ignored when DAVIS `masks` are given (the
        reference's precedence, ddim.py:565-606).

        Batched prompts (prompt = sequence of B strings): the B independent
        streams ride one queue [B, Q, h, w, C] and one U-Net batch per
        iteration — the `dp` mesh axis does real work in a single process
        (the reference's DP is process-level slicing, videocrafter_main.py:
        180-181 + ddp_wrapper.py). Noise is shared across the batch
        (ddim.shared_normal), so the run is bit-identical to B separate
        B=1 runs with the same key. cond_image/gamma are shared; returns a
        list of B frame-lists. DAVIS masks, multiprompts, mask_provider and
        viz require B=1 (they carry per-stream host state); frame_callback
        sees flat (iteration-major, prompt-minor) frame indices."""
        prompts = [prompt] if isinstance(prompt, str) else list(prompt)
        B = len(prompts)
        if B > 1:
            unsupported = [n for n, v in [
                ("masks", masks), ("davis_frames", davis_frames),
                ("clean_latents", clean_latents),
                ("multiprompts", multiprompts),
                ("mask_provider", mask_provider), ("viz", viz)] if v is not None]
            if unsupported:
                raise ValueError(
                    f"batched prompts (B={B}) do not support {unsupported}; "
                    "run those modes per-prompt (B=1)")
        h, w = height // 8, width // 8
        k_base, k_queue, k_fifo = jax.random.split(key, 3)

        # 1. conditioning
        ctx = self.base.encode_prompts(prompts)
        ctx2 = None
        if conditioned_prompt:
            # videocrafter_main.py:210-211 + DiffusionWrapper crossattn
            # concat (ddpm3d.py:710-712): token-axis concatenation
            ctx2 = self.base.encode_prompts([conditioned_prompt])
            ctx = jnp.concatenate(
                [ctx, jnp.broadcast_to(ctx2, (B,) + ctx2.shape[1:])], axis=1)
        uc = (self.base.uncond_context(B, like=ctx)
              if self.guidance_scale != 1.0 else None)
        if uc is not None and ctx.shape[1] != uc.shape[1]:
            reps = ctx.shape[1] // uc.shape[1]
            uc = jnp.concatenate([uc] * reps, axis=1)

        prompt_schedule = None
        if multiprompts:
            # every scene context gets the same conditioned-prompt concat
            # as the base context — all contexts in the stream must share
            # one token length for the CFG batch (the reference's
            # multiprompts path never co-existed with the concept concat)
            embeds = []
            for p, _ in multiprompts:
                e = self.base.encode_prompts([p])
                if ctx2 is not None:
                    e = jnp.concatenate([e, ctx2], axis=1)
                embeds.append(e)
            lengths = np.cumsum([n for _, n in multiprompts])
            prompt_schedule = (embeds, lengths)

        # 2. base latents (or DAVIS-encoded real video)
        if clean_latents is None:
            clean_latents = self._base_latents(
                prompts, k_base, (h, w), latents_dir)

        # 3. diagonal queue
        latents = prepare_queue(self.sch, self.plan, clean_latents, k_queue)

        # DAVIS tail anchor: the reference re-encodes the LAST real frame
        # with a fresh posterior sample on every shift (funcs.py:101-114).
        # Encode the moments once; each _fifo_iteration draws mean + std·ε.
        anchor = None
        if davis_frames is not None:
            anchor = self.model.encode_frame_moments(davis_frames[-1:])

        mask_queue = None
        seg_mode = mask_provider is not None and masks is None
        if masks is not None:
            # queue-aligned mask slots mirror the latent slots
            from moca_tpu.sampling.fifo import queue_frame_indices
            frame_idx, _ = queue_frame_indices(self.plan, masks.shape[0])
            mq = np.asarray(masks)[frame_idx][None, ..., None]
            mask_queue = jnp.asarray(mq, jnp.float32)
            mask_tail_src = np.asarray(masks)[-1][None, ..., None]
        elif seg_mode:
            # open-vocab: start with no masks; the provider fills t≤300
            # slots from each iteration's pred_x0
            mask_queue = jnp.zeros(
                (1, self.plan.queue_length, h, w, 1), jnp.float32)
            seg_target = target if target is not None else prompts[0]
            seg_frame_counter = 0
            seg_pending_pred = None  # seg_async: pred awaiting the provider

        cond = (jnp.asarray(cond_image, jnp.float32)
                if cond_image is not None else None)
        g = None if gamma is None else jnp.float32(gamma)

        # 4. FIFO streaming loop
        total = (self.new_video_length + self.num_inference_steps
                 - self.video_length)
        if multiprompts:
            total = (int(prompt_schedule[1][-1])
                     + self.num_inference_steps - self.video_length)
        from moca_tpu.utils.profiling import StepTimer
        timer = StepTimer()

        frames_out: List[np.ndarray] = []
        iter_keys = jax.random.split(k_fifo, total)
        j = 0
        pending_heads: List = []
        # each iteration contributes B head frames; a full flush is the
        # smallest multiple of B ≥ decode_batch so every flush (and the
        # padded final one) hits the SAME jitted decode shape
        flush_rows = B * -(-self.decode_batch // B)

        # --- mid-FIFO resume (snapshot = queue + masks + emitted frames +
        # open-vocab provider state) ---
        ckpt_path = (os.path.join(latents_dir, "fifo_state.npz")
                     if latents_dir and self.checkpoint_every else None)
        start_i = 0
        if ckpt_path and os.path.exists(ckpt_path):
            snap = np.load(ckpt_path)
            start_i = int(snap["i"])
            latents = jnp.asarray(snap["latents"])
            if mask_queue is not None and "mask_queue" in snap:
                mask_queue = jnp.asarray(snap["mask_queue"])
            frames_out = [f for f in snap["frames"]]
            j = int(snap["j"])
            if seg_mode:
                # restore the temporal-consistency chain: the per-frame
                # counter (PrecomputedMaskProvider indexing) and the
                # provider's previous mask (the IoU/empty-detection gates
                # of ddim.py:788-807 compare against it)
                seg_frame_counter = (int(snap["seg_frame_counter"])
                                     if "seg_frame_counter" in snap else 0)
                if "seg_prev_mask" in snap and hasattr(
                        mask_provider, "prev_mask"):
                    mask_provider.prev_mask = snap["seg_prev_mask"]
                if "seg_pending_pred" in snap:
                    # async mode: the snapshotted iteration's pred_x0 had
                    # not been through the provider yet
                    seg_pending_pred = jnp.asarray(snap["seg_pending_pred"])

        def checkpoint(i):
            if not ckpt_path:
                return
            flush()
            payload = dict(i=i + 1, j=j, latents=np.asarray(latents),
                           frames=np.stack(frames_out) if frames_out
                           else np.zeros((0,), np.float32))
            if mask_queue is not None:
                payload["mask_queue"] = np.asarray(mask_queue)
            if seg_mode:
                payload["seg_frame_counter"] = seg_frame_counter
                prev = getattr(mask_provider, "prev_mask", None)
                if prev is not None:
                    payload["seg_prev_mask"] = np.asarray(prev)
                if seg_pending_pred is not None:
                    payload["seg_pending_pred"] = np.asarray(seg_pending_pred)
            np.savez(ckpt_path + ".tmp.npz", **payload)
            os.replace(ckpt_path + ".tmp.npz", ckpt_path)

        def flush():
            if not pending_heads:
                return
            batch = jnp.concatenate(pending_heads, axis=0)
            k = batch.shape[0]
            if k < flush_rows:
                # pad the final partial batch up to the jitted shape — a
                # second batch-k VAE program would cost another full
                # remote compile (~1 min) for one flush
                batch = jnp.concatenate(
                    [batch, jnp.repeat(batch[-1:], flush_rows - k,
                                       axis=0)], axis=0)
            with timer.stage("decode"):
                decoded = np.asarray(
                    self._decode_heads(self.model.vae_params, batch))[:k]
            base = len(frames_out)
            for n, frame in enumerate(decoded):
                frames_out.append(frame)
                if frame_callback is not None:
                    frame_callback(base + n, frame)
            pending_heads.clear()

        for i in range(start_i, total):
            step_ctx = ctx
            if prompt_schedule is not None:
                from moca_tpu.sampling.fifo import advance_prompt_index
                embeds, lengths = prompt_schedule
                j = advance_prompt_index(
                    i, self.num_inference_steps, self.video_length,
                    lengths, j)  # funcs.py:427-431
                step_ctx = embeds[j]
            want_pred = seg_mode or viz is not None
            with timer.stage("fifo_iteration"):
                result = self._fifo_iteration(
                    self.model.unet_params, latents, (step_ctx, uc),
                    cond, mask_queue, g, iter_keys[i], masks is not None,
                    want_pred, anchor=anchor)
                if want_pred:
                    latents, head, pred_low = result
                else:
                    latents, head = result
            if viz is not None:
                # host-side artifact dump mirroring the reference's inline
                # pred_x0/mask/cond PNGs (ddim.py:611-641, 849-899)
                k = pred_low.shape[1]
                viz.moca_step(
                    i, np.asarray(pred_low[0]), self.plan.timesteps[:k],
                    mask=(np.asarray(mask_queue[0, 0])
                          if mask_queue is not None else None),
                    cond=(np.asarray(cond) if cond is not None else None))
            if masks is not None:
                mask_queue = shift_masks(
                    mask_queue, jnp.asarray(mask_tail_src, jnp.float32))
            elif seg_mode and self.seg_async:
                # iteration i is already dispatched above; segment the
                # PREVIOUS iteration's pred_x0 while the device computes —
                # its masks feed iteration i+1's dispatch (lag 2)
                if seg_pending_pred is not None:
                    with timer.stage("mask_provider"):
                        mask_queue, seg_frame_counter = self._pull_masks(
                            seg_pending_pred, mask_provider, seg_target,
                            seg_frame_counter, (h, w), lag=2)
                seg_pending_pred = pred_low
            elif seg_mode:
                with timer.stage("mask_provider"):
                    mask_queue, seg_frame_counter = self._pull_masks(
                        pred_low, mask_provider, seg_target,
                        seg_frame_counter, (h, w), lag=1)
            # heads stay on device; decode in batches (async dispatch keeps
            # the denoise pipeline ahead of the decodes)
            pending_heads.append(head)
            if len(pending_heads) * B >= self.decode_batch:
                flush()
            if self.checkpoint_every and (i + 1) % self.checkpoint_every == 0:
                checkpoint(i)
        if seg_mode and self.seg_async and seg_pending_pred is not None:
            # drain: the final iteration's t≤300 frames still go through the
            # detector (masks have no consumer, but the per-frame contract —
            # every low-t slot of every iteration is segmented, matching the
            # reference's sweep — and the provider's prev-mask state stay
            # mode-independent)
            with timer.stage("mask_provider"):
                _, seg_frame_counter = self._pull_masks(
                    seg_pending_pred, mask_provider, seg_target,
                    seg_frame_counter, (h, w), lag=2)
        flush()
        if ckpt_path and os.path.exists(ckpt_path):
            os.remove(ckpt_path)  # completed — drop the snapshot
        timer.report()  # one JSON line when MOCA_TPU_PROFILE=1
        if B == 1:
            return frames_out
        # regroup the flat (iteration-major, prompt-minor) frame stream
        # into one frame list per prompt
        return [frames_out[b::B] for b in range(B)]
