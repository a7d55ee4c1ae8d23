"""Batched evaluation sweep: prompts.csv → MoCA videos → metrics + VBench
full_info configs (ref: the VBench_Evaluation workflow + batch inference,
SURVEY §4 / §2.3).

Shards prompts across processes like the reference
(videocrafter_main.py:180-181 round-robin), runs the MoCA pipeline per
prompt, computes on-device SSIM/PSNR/temporal metrics against the base
(unmixed) clip, and emits VBench configs for external scoring.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_path", required=True)
    p.add_argument("--config", default="configs/inference_t2v_512_v2.0.yaml")
    p.add_argument("--prompt_file", default="prompts/prompts.csv")
    p.add_argument("--out_dir", default="results/eval_sweep")
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--new_video_length", type=int, default=100)
    p.add_argument("--seed", type=int, default=321)
    p.add_argument("--bpe_path", default=None)
    p.add_argument("--precision", default="bf16")
    # weights-gated Table-2 metrics (BASELINE.md): the t2v checkpoint has no
    # CLIP visual tower and no AlexNet, so CASS/relCASS and LPIPS activate
    # only when their weights are supplied
    p.add_argument("--clip_vision_ckpt", default=None,
                   help="OpenCLIP ViT-H visual state_dict → CASS/relCASS")
    p.add_argument("--lpips_ckpt", default=None,
                   help="torch file with {'alexnet': sd, 'lpips': sd} → LPIPS-I/T")
    p.add_argument("--i3d_ckpt", default=None,
                   help="pytorch-i3d i3d_pretrained_400.pt state_dict → "
                        "FVD(edited set, source set)")
    args = p.parse_args()

    from moca_tpu.cli.main import load_pipeline
    from moca_tpu.eval.metrics import psnr, ssim, temporal_lpips_proxy
    from moca_tpu.eval.vbench import write_full_info
    from moca_tpu.io.prompts import load_prompts
    from moca_tpu.io.video import load_conditioning_image, save_video

    class _A:  # adapt args for load_pipeline
        pass

    a = _A()
    for k, v in vars(args).items():
        setattr(a, k, v)
    a.video_length, a.num_partitions = 16, 4
    a.unconditional_guidance_scale, a.eta, a.fps = 12.0, 1.0, 10
    a.lookahead_denoising, a.gamma, a.inject_into_queue = True, 0.5, False
    pipe = load_pipeline(a)
    pipe.new_video_length = args.new_video_length

    prompts = load_prompts(args.prompt_file)
    indices = list(range(len(prompts)))[args.rank :: args.num_processes]
    os.makedirs(args.out_dir, exist_ok=True)

    # --- weights-gated metric towers -----------------------------------
    cass_fns = None
    if args.clip_vision_ckpt:
        import jax.numpy as jnp
        from moca_tpu.eval.metrics import concept_alignment_scores
        from moca_tpu.models.clip_text import CLIPTextEncoder
        from moca_tpu.models.clip_vision import CLIPVisionConfig, CLIPVisionEncoder
        from moca_tpu.models.convert import (
            convert_clip, convert_clip_vision, load_torch_state_dict)

        vision = CLIPVisionEncoder(CLIPVisionConfig())
        v_params = convert_clip_vision(
            load_torch_state_dict(args.clip_vision_ckpt), prefix="")
        # full text tower (+text_projection) for pooled embeddings
        t_params = convert_clip(load_torch_state_dict(args.ckpt_path),
                                pipe.model.clip_cfg, full=True)
        text = CLIPTextEncoder(pipe.model.clip_cfg)

        def embed_frames(video):  # [T,H,W,3] in [-1,1] → [T,1024]
            return vision.apply(v_params, jnp.asarray(video))

        def embed_text(prompt):
            tokens = jnp.asarray(pipe.tokenizer([prompt]))
            return text.apply(t_params, tokens, output="embed")[0]

        cass_fns = (embed_frames, embed_text, concept_alignment_scores)

    lpips_fns = None
    if args.lpips_ckpt:
        import torch
        from moca_tpu.eval.metrics import convert_lpips_weights, lpips_i, lpips_t

        blob = torch.load(args.lpips_ckpt, map_location="cpu")
        lp_params, lp_lin = convert_lpips_weights(
            {k: v.numpy() for k, v in blob["alexnet"].items()},
            {k: v.numpy() for k, v in blob["lpips"].items()})
        lpips_fns = (lp_params, lp_lin, lpips_i, lpips_t)

    i3d_fn = None
    if args.i3d_ckpt:
        import torch
        from moca_tpu.eval.i3d import convert_i3d_weights, i3d_feature_fn

        i3d_fn = i3d_feature_fn(convert_i3d_weights(
            {k: v.numpy() for k, v in
             torch.load(args.i3d_ckpt, map_location="cpu").items()}))

    entries, metrics = [], {}
    # FVD: per-pair [1,400] I3D feature rows accumulated as videos arrive,
    # NOT whole decoded float videos held until the end (eval/fvd.py
    # StreamingFVD — uniform clip length fixed by the first usable pair)
    fvd_stream = None
    if i3d_fn is not None:
        from moca_tpu.eval.fvd import StreamingFVD
        fvd_stream = StreamingFVD(i3d_fn)
    for idx in indices:
        row = prompts[idx]
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), idx)
        cond = load_conditioning_image(row["conditioned_image_path"], (40, 64))
        frames = pipe(row["prompt"], key, cond_image=cond,
                      conditioned_prompt=row["conditioned_prompt"],
                      gamma=row["gamma"],
                      latents_dir=os.path.join(args.out_dir, f"latents_{idx}"))
        video_path = os.path.join(args.out_dir, f"{idx:03d}.mp4")
        save_video(frames[-args.new_video_length // 2:], video_path, fps=10)
        vid = np.stack(frames)
        metrics[idx] = {
            "prompt": row["prompt"],
            "temporal_consistency": float(temporal_lpips_proxy((vid + 1) / 2)),
            "frame_ssim_adjacent": float(
                np.mean(np.asarray(ssim((vid[:-1] + 1) / 2, (vid[1:] + 1) / 2)))),
            "frame_psnr_adjacent": float(
                np.mean(np.asarray(psnr((vid[:-1] + 1) / 2, (vid[1:] + 1) / 2)))),
        }

        # source (unmixed) video from the cached base latents — the CASS /
        # LPIPS-I comparison target (Table 2 compares edited vs source)
        src_vid = None
        base_cache = os.path.join(args.out_dir, f"latents_{idx}",
                                  f"{pipe.num_inference_steps}.npz")
        if (cass_fns or lpips_fns or i3d_fn) and os.path.exists(base_cache):
            import jax.numpy as jnp
            base_lat = jnp.asarray(np.load(base_cache)["latents"])
            src_vid = np.asarray(pipe.model.decode_latents(base_lat))[0]

        if cass_fns is not None and src_vid is not None:
            embed_frames, embed_text, alignment = cass_fns
            scores = alignment(
                embed_frames(src_vid),
                embed_frames(vid[: len(src_vid)]),
                embed_text(row["prompt"]),
                embed_text(row["conditioned_prompt"] or row["prompt"]))
            metrics[idx].update({k: float(v) for k, v in scores.items()})

        if lpips_fns is not None and src_vid is not None:
            lp_params, lp_lin, f_i, f_t = lpips_fns
            n = min(len(src_vid), len(vid))
            metrics[idx]["lpips_i"] = float(
                f_i(src_vid[:n], vid[:n], lp_params, lp_lin))
            metrics[idx]["lpips_t"] = float(f_t(vid, lp_params, lp_lin))

        if fvd_stream is not None and src_vid is not None:
            fvd_stream.add((np.asarray(vid) + 1) / 2,
                           (np.asarray(src_vid) + 1) / 2)

        entries.append({"prompt": row["prompt"], "video_path": video_path})

    write_full_info(args.out_dir, entries)
    if cass_fns is not None:
        # no CASS reference code exists to calibrate against (DECISIONS #11)
        # — keep the caveat attached to the numbers themselves
        metrics["_cass_convention"] = (
            "CASS/relCASS follow moca_tpu's own x100 convention "
            "(eval/metrics.py); NOT directly comparable to the paper's "
            "published 4.93/1.23 — the paper ships no metric code")
    if fvd_stream is not None:
        # FVD is a SET metric (one Gaussian per side): None with <2 pairs
        r = fvd_stream.result()
        metrics["_fvd_edited_vs_source"] = None if r is None else float(r)
        if fvd_stream.skipped:
            metrics["_fvd_videos_skipped"] = fvd_stream.skipped

    with open(os.path.join(args.out_dir, f"metrics_rank{args.rank}.json"),
              "w") as f:
        json.dump(metrics, f, indent=1)
    summary = {"videos": len(entries)}
    if cass_fns is not None:
        summary["cass_convention"] = metrics["_cass_convention"]
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
