"""Generate missing conditioning images for prompts.csv
(ref: scripts/prep/generate_condition_images.py — which shells out to an
external Stable Diffusion 2.1 via diffusers/CUDA).

TPU-native equivalent: sample a single frame from the in-house
VideoCrafter2 stack (T2VPipeline with frames=1) — no external model needed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(
        description="Generate missing conditioned images (TPU)")
    p.add_argument("--ckpt_path", type=str, required=True)
    p.add_argument("--config", type=str,
                   default="configs/inference_t2v_512_v2.0.yaml")
    p.add_argument("--prompts_file", type=str, default="prompts/prompts.csv")
    p.add_argument("--assets_dir", type=str, default="assets")
    p.add_argument("--num_steps", type=int, default=50)
    p.add_argument("--guidance_scale", type=float, default=7.5)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--bpe_path", type=str, default=None)
    p.add_argument("--precision", type=str, default="bf16")
    return p.parse_args()


def main():
    args = parse_args()
    from PIL import Image

    from moca_tpu.config import load_model_config
    from moca_tpu.io.checkpoint import load_or_convert
    from moca_tpu.io.prompts import load_prompts
    from moca_tpu.io.video import tensor_to_uint8
    from moca_tpu.models.latent_diffusion import LatentDiffusion
    from moca_tpu.models.tokenizer import load_tokenizer
    from moca_tpu.pipelines.t2v import T2VPipeline

    rows = load_prompts(args.prompts_file)
    missing = [
        r for r in rows
        if r["conditioned_image_path"]
        and not os.path.exists(r["conditioned_image_path"])
    ]
    if not missing:
        print("all conditioned images present")
        return

    cfg = load_model_config(args.config, dtype=args.precision)
    unet_p, vae_p, clip_p = load_or_convert(
        args.ckpt_path, cfg.unet, cfg.vae, cfg.clip)
    model = LatentDiffusion(cfg.unet, cfg.vae, cfg.clip, unet_p, vae_p,
                            clip_p, scale_factor=cfg.diffusion.scale_factor)
    pipe = T2VPipeline.build(model, load_tokenizer(args.bpe_path),
                             num_steps=args.num_steps,
                             use_scale=cfg.diffusion.use_scale,
                             guidance_scale=args.guidance_scale)

    os.makedirs(args.assets_dir, exist_ok=True)
    for i, row in enumerate(missing):
        prompt = row["conditioned_prompt"].rstrip(".") or row["conditioned_object"]
        frame = pipe(prompt, jax.random.fold_in(jax.random.PRNGKey(args.seed), i),
                     height=args.height, width=args.width, frames=1)
        img = tensor_to_uint8(np.asarray(frame[0]))
        out = row["conditioned_image_path"]
        os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
        Image.fromarray(img).convert("RGBA").save(out)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
