"""One-command real-weights acceptance certification.

The environment this framework was built in has no VideoCrafter2
`model.ckpt` and no OpenCLIP BPE vocab, so end-to-end numerical parity vs
the CUDA reference rests on randomized full-config oracles. This script
packages the ENTIRE certification so a user who has the weights gets the
BASELINE.md verdict (per-frame SSIM >= 0.98 vs the CUDA reference) in one
command:

    python scripts/acceptance.py \
        --ckpt /path/model.ckpt \
        --bpe /path/bpe_simple_vocab_16e6.txt.gz \
        [--config configs/inference_t2v_512_v2.0.yaml] \
        [--reference_frames ref.npz | dir-of-PNGs] \
        [--out acceptance.json] [--skip_oracles]

Stages (each records ok / detail in the one-line JSON verdict):
  convert   — torch ckpt -> Flax trees (plain / DeepSpeed formats handled
              by load_torch_state_dict, ref funcs.py:487-503; LitEma
              shadows extracted when present)
  tokenizer — BPE table loads; known-answer ids when the real 16e6 vocab
              is detected (openai/CLIP published tokenizations)
  oracles   — randomized torch<->flax tower parity at the full shipped
              config (scripts/full_oracle_check.py; needs the reference
              repo + torch, skipped cleanly when absent)
  golden    — a seeded concept-mixed MoCA clip with the CONVERTED weights
              (videocrafter_main.py defaults: f x n DDIM steps, seed 321),
              finite + saved to --artifacts for the CUDA side to diff.
              Pass --masks (detector masks exported from the reference
              run) to drive the injection path. NOTE on frame parity:
              faithful to the reference, injection and the gamma-blend
              touch only the returned pred_x0 — the queue write-back
              x_prev is computed first (ddim.py:562 vs :565-609) and
              funcs.py decodes queue latents — so the EMITTED FRAMES are
              identical with or without masks on both sides, and the SSIM
              gate is valid either way. --inject_into_queue opts into our
              documented fixed mode (frames then do change; not for
              reference-parity runs).
  ssim      — per-frame SSIM of the golden clip vs --reference_frames,
              gated at --ssim_threshold (default 0.98, BASELINE.md)

To produce the comparison set on the CUDA side, run the reference
`videocrafter_main.py` with the same seed/prompt/shape. Its exported clip
keeps the LAST new_video_length//2 frames (videocrafter_main.py:230);
the golden stage keeps the same tail slice, and stage_ssim aligns frame
streams from the END. Export the reference frames as uint8 PNGs or one
.npz with key "frames" [N,H,W,3] float in [-1,1]; its detector masks
(the visualization dumps) as .npz key "masks" [T, H/8, W/8] binary for
--masks.

Exit code 0 iff every non-skipped stage passed.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ckpt", required=True, help="VideoCrafter2 model.ckpt")
    p.add_argument("--bpe", required=True,
                   help="OpenCLIP bpe_simple_vocab_16e6.txt.gz")
    p.add_argument("--config", default="configs/inference_t2v_512_v2.0.yaml")
    p.add_argument("--reference_frames", default=None,
                   help=".npz with 'frames' [N,H,W,3] in [-1,1], or a "
                        "directory of frame_*.png from the CUDA reference "
                        "(the exported clip = the LAST new_video_length//2 "
                        "frames; streams are compared tail-aligned)")
    p.add_argument("--masks", default=None,
                   help=".npz with 'masks' [T, H/8, W/8] binary detector "
                        "masks exported from the reference run; routes "
                        "them through PrecomputedMaskProvider so the "
                        "injection path runs (note: faithful to the "
                        "reference, injection touches only pred_x0 — the "
                        "emitted frames change only with "
                        "--inject_into_queue, ddim.py:562 vs :565-609)")
    p.add_argument("--inject_into_queue", action="store_true", default=False,
                   help="our documented 'fixed' injection mode "
                        "(MoCAConfig.inject_into_queue): injected pred_x0 "
                        "feeds the queue write-back; OFF for reference "
                        "parity runs")
    p.add_argument("--out", default="acceptance.json")
    p.add_argument("--artifacts", default="acceptance_artifacts",
                   help="golden-clip frames/video land here")
    p.add_argument("--prompt", default="a cat running on the grass")
    p.add_argument("--conditioned_prompt", default="a cat")
    p.add_argument("--target", default="cat")
    p.add_argument("--seed", type=int, default=321)  # videocrafter_main.py:249
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--video_length", type=int, default=16)
    p.add_argument("--num_partitions", type=int, default=4)
    p.add_argument("--new_video_length", type=int, default=16)
    p.add_argument("--guidance_scale", type=float, default=12.0)
    p.add_argument("--ssim_threshold", type=float, default=0.98)
    p.add_argument("--skip_oracles", action="store_true",
                   help="skip the randomized torch<->flax tower oracles "
                        "(they need the reference repo + ~25 GB RAM)")
    p.add_argument("--skip_golden", action="store_true",
                   help="certify conversion/tokenizer/oracles only")
    p.add_argument("--precision", default=None,
                   help="bf16 for TPU runs; default fp32")
    return p


def _stage(report, name):
    report["stages"][name] = entry = {"ok": None}
    return entry


def stage_convert(args, report):
    from moca_tpu.config import load_model_config
    from moca_tpu.models.convert import (
        convert_checkpoint, load_torch_state_dict)

    entry = _stage(report, "convert")
    cfg = load_model_config(args.config, dtype=args.precision)
    sd = load_torch_state_dict(args.ckpt)
    entry["ckpt_keys"] = len(sd)
    entry["ema_shadow_present"] = any(k.startswith("model_ema.") for k in sd)
    use_ema = entry["ema_shadow_present"]
    if use_ema:
        # inference uses the EMA weights when a LitEma shadow exists
        # (ddpm3d.py ema_scope); the shipped ckpt has use_ema false
        entry["note"] = "LitEma shadow found; converting EMA weights"
    unet_p, vae_p, clip_p = convert_checkpoint(
        args.ckpt, cfg.unet, cfg.vae, cfg.clip, use_ema=use_ema)
    import jax

    def stats(tree):
        leaves = jax.tree.leaves(tree)
        n = sum(int(np.prod(l.shape)) for l in leaves)
        finite = all(np.isfinite(np.asarray(l)).all() for l in leaves)
        return n, finite

    for name, tree in (("unet", unet_p), ("vae", vae_p), ("clip", clip_p)):
        n, finite = stats(tree)
        entry[f"{name}_params"] = n
        if not finite:
            entry["ok"] = False
            entry["error"] = f"non-finite values in converted {name} tree"
            return None
    entry["ok"] = True
    return cfg, (unet_p, vae_p, clip_p)


def stage_tokenizer(args, report):
    from moca_tpu.models.tokenizer import SimpleTokenizer

    entry = _stage(report, "tokenizer")
    tok = SimpleTokenizer(args.bpe)
    framed = tok([args.prompt])
    entry["vocab_size"] = tok.sot + 2  # sot = vocab-2 by construction
    entry["prompt_tokens"] = int((framed[0] != 0).sum())
    if tok.sot == 49406:  # the real 16e6 table → pin published ids
        known = {
            "a diagram": [320, 22697],
            "a dog": [320, 1929],
            "a cat": [320, 2368],
            "a photo of a cat": [320, 1125, 539, 320, 2368],
        }
        mismatches = {t: (tok.encode(t), ids) for t, ids in known.items()
                      if tok.encode(t) != ids}
        entry["known_answer_checked"] = True
        if mismatches:
            entry["ok"] = False
            entry["error"] = f"BPE known-answer mismatch: {mismatches}"
            return None
    else:
        entry["known_answer_checked"] = False
        entry["note"] = ("vocab is not the 49408-entry CLIP table; "
                         "known-answer ids not applicable")
    entry["ok"] = True
    return tok


def stage_oracles(args, report):
    """Randomized full-config torch<->flax parity, in a SUBPROCESS:
    full_oracle_check forces jax to CPU at import (by design — it is a
    host-side torch comparison) and needs ~25 GB RAM; isolating it keeps
    this process's backend (e.g. the TPU for the golden clip) intact."""
    import re
    import subprocess

    entry = _stage(report, "oracles")
    if args.skip_oracles:
        entry["ok"] = None
        entry["skipped"] = "--skip_oracles"
        return
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "full_oracle_check.py")
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, script], capture_output=True,
                           text=True, timeout=3600)
    except subprocess.TimeoutExpired:
        entry["ok"] = False
        entry["error"] = "full_oracle_check timed out (1h)"
        return
    entry["seconds"] = round(time.time() - t0, 1)
    m = re.search(r"FULL ORACLE OK\s+unet=([\d.e+-]+)\s+vae=([\d.e+-]+)",
                  r.stdout)
    if r.returncode == 0 and m:
        entry["unet_max_err"] = float(m.group(1))
        entry["vae_max_err"] = float(m.group(2))
        entry["ok"] = True
        return
    tail = (r.stderr or r.stdout).strip().splitlines()[-5:]
    if any(s in (r.stderr or "") for s in
           ("No module named", "ModuleNotFoundError", "FileNotFoundError")):
        # the reference repo / torch isn't on the user's machine — the
        # oracles certify the converter, not the weights; record and move on
        entry["ok"] = None
        entry["skipped"] = f"oracle prerequisites missing: {tail[-1]}"
        return
    entry["ok"] = False
    entry["error"] = tail


def stage_golden(args, report, cfg, trees, tok):
    import jax

    from moca_tpu.io.video import save_video, tensor_to_uint8
    from moca_tpu.models.latent_diffusion import LatentDiffusion
    from moca_tpu.pipelines.moca_video import MoCAVideoPipeline
    from moca_tpu.sampling.moca import MoCAConfig

    entry = _stage(report, "golden")
    unet_p, vae_p, clip_p = trees
    model = LatentDiffusion(cfg.unet, cfg.vae, cfg.clip, unet_p, vae_p,
                            clip_p, scale_factor=cfg.diffusion.scale_factor)
    pipe = MoCAVideoPipeline(
        model, tok, video_length=args.video_length,
        num_partitions=args.num_partitions,
        new_video_length=args.new_video_length,
        guidance_scale=args.guidance_scale,
        moca=MoCAConfig(inject_into_queue=args.inject_into_queue),
        use_scale=cfg.diffusion.use_scale,
        uncond_type=cfg.diffusion.uncond_type,
        # deterministic lag-1 mask placement (the r3 sync schedule) so the
        # run is reproducible against a reference-side mask export
        seg_async=False)
    mask_provider = None
    if args.masks is not None:
        from moca_tpu.io.segmentation import PrecomputedMaskProvider

        mask_provider = PrecomputedMaskProvider(
            np.asarray(np.load(args.masks)["masks"], np.float32))
        entry["injection"] = "precomputed masks" + (
            " (into queue)" if args.inject_into_queue else
            " (pred_x0 only — reference-faithful; frames unchanged)")
    else:
        entry["injection"] = ("inactive (no --masks): the injection gate "
                              "requires masks")
    h, w = args.height // 8, args.width // 8
    # the reference's hard-coded conditioning image (assets/cats.png resized
    # to latent res, videocrafter_main.py:86-98) is a constant RGBA tensor;
    # a flat mid-gray stand-in keeps the run self-contained — pass the real
    # asset through --reference_frames parity instead
    cond = np.full((h, w, 4), 0.5, np.float32)
    t0 = time.time()
    frames = pipe(args.prompt, jax.random.PRNGKey(args.seed),
                  cond_image=cond,
                  conditioned_prompt=args.conditioned_prompt,
                  gamma=0.5, height=args.height, width=args.width,
                  target=args.target, mask_provider=mask_provider)
    entry["seconds"] = round(time.time() - t0, 1)
    # the reference CLI exports the LAST new_video_length//2 frames
    # (videocrafter_main.py:230: video_frames[-new_video_length//2:]) —
    # keep the SAME tail slice so stage_ssim compares aligned frames
    # NB -N//2 (floor), not -(N//2): odd N keeps ceil(N/2) tail frames
    frames = frames[-args.new_video_length // 2:]
    arr = np.stack(frames)
    entry["frames"] = int(arr.shape[0])
    entry["finite"] = bool(np.isfinite(arr).all())
    os.makedirs(args.artifacts, exist_ok=True)
    np.savez(os.path.join(args.artifacts, "golden_frames.npz"), frames=arr)
    save_video(frames, os.path.join(args.artifacts, "golden.mp4"), fps=10)
    try:
        from PIL import Image

        for i, f in enumerate(frames):
            Image.fromarray(tensor_to_uint8(f)).save(
                os.path.join(args.artifacts, f"frame_{i:04d}.png"))
    except Exception:
        pass
    entry["artifacts"] = os.path.abspath(args.artifacts)
    entry["ok"] = entry["finite"] and entry["frames"] > 0
    return arr if entry["ok"] else None


def _load_reference_frames(path):
    if os.path.isdir(path):
        pngs = sorted(glob.glob(os.path.join(path, "*.png")))
        if not pngs:
            raise FileNotFoundError(f"no PNGs in {path}")
        from PIL import Image

        from moca_tpu.io.video import uint8_to_tensor

        return np.stack([uint8_to_tensor(np.asarray(Image.open(p).convert("RGB")))
                         for p in pngs])
    data = np.load(path)
    return np.asarray(data["frames"])


def stage_ssim(args, report, golden):
    entry = _stage(report, "ssim")
    if args.reference_frames is None:
        entry["ok"] = None
        entry["skipped"] = ("no --reference_frames given; generate them "
                            "with the CUDA reference at the same "
                            "seed/prompt/shape and re-run")
        return
    if golden is None:
        entry["ok"] = None
        entry["skipped"] = ("golden stage failed — nothing to compare "
                            "(see stages.golden)")
        return
    from moca_tpu.eval.metrics import ssim

    ref = _load_reference_frames(args.reference_frames)
    n = min(len(ref), len(golden))
    entry["compared_frames"] = int(n)
    if len(ref) != len(golden):
        entry["note"] = (f"frame count mismatch (ours {len(golden)}, "
                         f"reference {len(ref)}); compared the LAST {n} "
                         "of each (both exports are tail slices of the "
                         "FIFO stream, videocrafter_main.py:230)")
    # SSIM on [0,1]; tail-aligned — both sides export the stream's tail
    a = (golden[-n:].astype(np.float32) + 1.0) / 2.0
    b = (ref[-n:].astype(np.float32) + 1.0) / 2.0
    per_frame = [float(ssim(a[i], b[i])) for i in range(n)]
    entry["ssim_per_frame_min"] = round(min(per_frame), 4)
    entry["ssim_mean"] = round(float(np.mean(per_frame)), 4)
    entry["threshold"] = args.ssim_threshold
    entry["ok"] = min(per_frame) >= args.ssim_threshold


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    report = {"stages": {}, "ckpt": os.path.abspath(args.ckpt),
              "config": args.config, "seed": args.seed}
    golden = None
    try:
        converted = stage_convert(args, report)
        tok = stage_tokenizer(args, report) if converted else None
        stage_oracles(args, report)
        if converted and tok is not None and not args.skip_golden:
            cfg, trees = converted
            golden = stage_golden(args, report, cfg, trees, tok)
            stage_ssim(args, report, golden)
    except Exception as e:  # a stage crash is a failed verdict, not a trace
        import traceback

        report["error"] = f"{type(e).__name__}: {e}"
        report["traceback"] = traceback.format_exc().splitlines()[-3:]
    oks = [s["ok"] for s in report["stages"].values()]
    report["ok"] = bool(oks) and all(ok is not False for ok in oks) \
        and "error" not in report
    report["passed"] = sum(1 for ok in oks if ok is True)
    report["skipped"] = sum(1 for ok in oks if ok is None)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    return 0 if report["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
