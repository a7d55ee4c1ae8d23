"""Batch T2V inference CLI (ref: scripts/evaluation/inference.py +
ddp_wrapper.py).

Plain VideoCrafter text-to-video batch sampling over a prompt list, sharded
contiguously across processes (inference.py:71-77). Multi-host launch uses
`jax.distributed` instead of the reference's NCCL DDP wrapper.
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import numpy as np

from moca_tpu.config import load_model_config
from moca_tpu.io.video import save_video_grid
from moca_tpu.models.convert import convert_checkpoint
from moca_tpu.models.latent_diffusion import LatentDiffusion
from moca_tpu.models.tokenizer import load_tokenizer
from moca_tpu.pipelines.t2v import T2VPipeline
from moca_tpu.utils.logging import get_logger

log = get_logger("moca_tpu.inference")


def build_parser():
    p = argparse.ArgumentParser("batch T2V inference")
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--config", type=str,
                   default="configs/inference_t2v_512_v2.0.yaml")
    p.add_argument("--prompt_file", type=str, required=True,
                   help="one prompt per line")
    p.add_argument("--savedir", type=str, default="results/t2v")
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--ddim_eta", type=float, default=1.0)
    p.add_argument("--unconditional_guidance_scale", type=float, default=12.0)
    p.add_argument("--unconditional_guidance_scale_temporal", type=float,
                   default=None, help="temporal consistency guidance "
                   "(inference.py:36; implemented for real — the reference "
                   "swallows the flag, see DECISIONS.md)")
    p.add_argument("--n_samples", type=int, default=1,
                   help="samples per prompt (inference.py:27)")
    p.add_argument("--bs", type=int, default=1,
                   help="prompts per batched sampling call "
                        "(inference.py:30,92-101); base mode only — i2v "
                        "and FreeInit stay per-prompt")
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--frames", type=int, default=16)
    p.add_argument("--fps", type=int, default=28)
    p.add_argument("--savefps", type=int, default=10)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--freeinit_iters", type=int, default=0,
                   help="FreeInit noise-reinit iterations (0 = off)")
    p.add_argument("--mode", type=str, default="base",
                   choices=["base", "i2v"],
                   help="i2v: per-prompt conditioning images whose CLIP "
                        "tokens are concatenated to the text context "
                        "(inference.py:110-117)")
    p.add_argument("--cond_image_dir", "--cond_input", type=str,
                   default=None, dest="cond_image_dir",
                   help="i2v mode: directory of images matched to prompts "
                        "by sorted order (--cond_input is the reference's "
                        "flag name, inference.py:38)")
    p.add_argument("--mesh", type=str, default=None, metavar="DP,FIFO",
                   help="shard the batched CFG/prompt rows + decode over a "
                        "device mesh, e.g. '1,8' with --bs 4 on a v5e-8 — "
                        "in-process multi-chip (the reference forks one "
                        "process per GPU instead, ddp_wrapper.py)")
    return p


def _load_i2v_model(args, cfg):
    """Build LatentVisualDiffusion with the image embedder + projector
    (ddpm3d.py:660-694)."""
    import numpy as np

    from moca_tpu.models.clip_vision import CLIPVisionConfig
    from moca_tpu.models.convert import (
        convert_clip_vision, convert_image_proj, load_torch_state_dict,
        convert_unet, convert_vae, convert_clip)
    from moca_tpu.models.latent_diffusion import LatentVisualDiffusion

    sd = load_torch_state_dict(args.ckpt_path)
    vcfg = CLIPVisionConfig()
    return LatentVisualDiffusion(
        cfg.unet, cfg.vae, cfg.clip,
        convert_unet(sd, cfg.unet), convert_vae(sd, cfg.vae),
        convert_clip(sd, cfg.clip),
        scale_factor=cfg.diffusion.scale_factor,
        vision_cfg=vcfg,
        vision_params=convert_clip_vision(sd, layers=vcfg.layers),
        proj_params=convert_image_proj(sd),
        finegrained=cfg.finegrained)


def main(args):
    cfg = load_model_config(args.config, dtype=args.precision)
    if args.mode == "i2v" or cfg.is_i2v:
        model = _load_i2v_model(args, cfg)
    else:
        unet_p, vae_p, clip_p = convert_checkpoint(
            args.ckpt_path, cfg.unet, cfg.vae, cfg.clip)
        model = LatentDiffusion(cfg.unet, cfg.vae, cfg.clip, unet_p, vae_p,
                                clip_p,
                                scale_factor=cfg.diffusion.scale_factor)
    from moca_tpu.cli.main import parse_mesh
    pipe = T2VPipeline.build(
        model, load_tokenizer(args.bpe_path), num_steps=args.ddim_steps,
        eta=args.ddim_eta, use_scale=cfg.diffusion.use_scale,
        guidance_scale=args.unconditional_guidance_scale, fps=args.fps,
        temporal_cfg_scale=args.unconditional_guidance_scale_temporal,
        uncond_type=cfg.diffusion.uncond_type, mesh=parse_mesh(args))

    with open(args.prompt_file) as f:
        prompts = [l.strip() for l in f if l.strip()]
    # contiguous shard per process (inference.py:71-77)
    per = -(-len(prompts) // args.num_processes)
    shard = prompts[args.rank * per : (args.rank + 1) * per]

    cond_images = None
    cond_names = None
    if args.mode == "i2v":
        assert args.cond_image_dir, "--cond_image_dir required for i2v"
        from moca_tpu.io.video import load_image_batch
        # ext-filter like the reference's get_filelist(..., '[mpj][pn][4gj]')
        # (inference.py:82, funcs.py:567-573): a stray .txt/.DS_Store in the
        # dir must not crash the loader or shift the prompt↔image pairing
        files = sorted(f for f in os.listdir(args.cond_image_dir)
                       if f.endswith((".mp4", ".png", ".jpg")))
        # the reference's exact chain (inference.py:113): resize the raw
        # image to the GENERATION size (H, W) with cv2 bilinear before the
        # embedder's own 224 bicubic preprocessing. RGB slice: the loader
        # keeps RGBA like the reference's convert, but the reference's own
        # png/jpg i2v path then CRASHES in kornia's 3-channel normalize
        # (condition.py:324-332) — only its mp4 path is runnable; we take
        # the first three channels instead (DECISIONS.md).
        cond_images = load_image_batch(
            [os.path.join(args.cond_image_dir, f) for f in files],
            (args.height, args.width))[..., :3]
        # one image per prompt, same contract as the reference
        # (inference.py:83) — without it the stem-derived output names
        # below would collide and silently overwrite videos
        assert len(cond_images) == len(prompts), (
            f"Error: conditional input ({len(cond_images)}) NOT match "
            f"prompt ({len(prompts)})!")
        # outputs are named after the conditioning-image stem, like the
        # reference (inference.py:84)
        cond_names = [os.path.splitext(f)[0] for f in files]

    os.makedirs(args.savedir, exist_ok=True)

    if args.bs > 1:
        # batched prompt rounds (inference.py:92-101): bs prompts ride one
        # DDIM scan / one U-Net batch. Batched-prompt DP composes with the
        # process shard above exactly like the reference's bs × DDP.
        assert args.mode == "base" and args.freeinit_iters <= 1 and \
            args.n_samples == 1, "--bs>1 supports plain base sampling"
        for r0 in range(0, len(shard), args.bs):
            chunk = shard[r0 : r0 + args.bs]
            t0 = time.time()
            key = jax.random.fold_in(
                jax.random.PRNGKey(args.seed), args.rank * per + r0)
            videos = pipe(chunk, key, height=args.height, width=args.width,
                          frames=args.frames, use_ddpm=args.ddim_steps <= 0)
            for prompt, video in zip(chunk, videos):
                name = prompt[:100].replace("/", "_")
                # the reference's make_grid layout, n_samples=1
                # (funcs.py:600-612 via save_videos)
                save_video_grid([[np.asarray(v) for v in video]],
                                os.path.join(args.savedir, f"{name}.mp4"),
                                fps=args.savefps)
            log.info("batch [%d:%d]/%d %.1fs", r0, r0 + len(chunk),
                     len(shard), time.time() - t0)
        return

    for i, prompt in enumerate(shard):
        t0 = time.time()
        img_tokens = None
        name = prompt[:100].replace("/", "_")
        if cond_images is not None:
            # image tokens appended to the text context on the token axis
            # (inference.py:110-117)
            j = args.rank * per + i  # global prompt index == image index
            img = cond_images[j]
            img_tokens = model.get_image_embeds(img[None])
            name = cond_names[j]
        samples = []
        for s in range(args.n_samples):
            key = jax.random.fold_in(
                jax.random.PRNGKey(args.seed),
                (args.rank * per + i) * max(args.n_samples, 1) + s)
            if args.freeinit_iters > 1:
                video = pipe.sample_with_freeinit(
                    prompt, key, iterations=args.freeinit_iters,
                    height=args.height, width=args.width, frames=args.frames)
            else:
                video = pipe(prompt, key, height=args.height,
                             width=args.width, frames=args.frames,
                             image_tokens=img_tokens,
                             use_ddpm=args.ddim_steps <= 0)
            samples.append([np.asarray(v) for v in video])
        # ONE mp4 per prompt, all n_samples side by side in a make_grid
        # row — the reference's save_videos layout (funcs.py:600-612,
        # inference.py:125)
        save_video_grid(samples, os.path.join(args.savedir, f"{name}.mp4"),
                        fps=args.savefps)
        log.info("[%d/%d] %.1fs %s", i + 1, len(shard), time.time() - t0,
                 prompt[:60])


if __name__ == "__main__":
    main(build_parser().parse_args())


def _entry():
    main(build_parser().parse_args())
