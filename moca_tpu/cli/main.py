"""MoCA-Video CLI — flag surface mirrors the reference's videocrafter_main.py.

Usage (prompt mode):
    python -m moca_tpu.cli.main --ckpt_path model.ckpt \
        --config configs/inference_t2v_512_v2.0.yaml \
        --prompt_file prompts/prompts.csv --prompt_index 0

DAVIS mode:
    python -m moca_tpu.cli.main --use_davis --video_name blackswan ...

Ref: videocrafter_main.py:235-276 (argparse), :66-232 (main).
"""

from __future__ import annotations

import argparse
import os

import jax

from moca_tpu.config import load_model_config
from moca_tpu.io.davis import get_davis_prompt, load_davis_data
from moca_tpu.io.prompts import load_prompts
from moca_tpu.io.video import load_conditioning_image, save_video
from moca_tpu.models.latent_diffusion import LatentDiffusion
from moca_tpu.models.tokenizer import load_tokenizer
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline
from moca_tpu.sampling.moca import MoCAConfig
from moca_tpu.utils.logging import get_logger

log = get_logger("moca_tpu.cli")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="MoCA-Video on TPU")
    # — reference flags (videocrafter_main.py:236-269), defaults preserved —
    p.add_argument("--ckpt_path", type=str,
                   default="videocrafter_models/base_512_v2/model.ckpt")
    p.add_argument("--config", type=str,
                   default="configs/inference_t2v_512_v2.0.yaml")
    p.add_argument("--seed", type=int, default=321)
    p.add_argument("--video_length", type=int, default=16, help="f in paper")
    p.add_argument("--num_partitions", "-n", type=int, default=4)
    p.add_argument("--num_inference_steps", type=int, default=16,
                   help="forced to f·n")
    p.add_argument("--prompt_file", "-p", type=str, default="prompts/prompts.csv")
    p.add_argument("--new_video_length", "-l", type=int, default=100)
    p.add_argument("--num_processes", type=int, default=1)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--height", type=int, default=320)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--save_frames", action="store_true", default=True)
    # The reference declares these three as store_true with default=True —
    # impossible to disable (videocrafter_main.py:249-252 argparse bug).
    # Divergence (DECISIONS.md): keep the reference surface, add negations.
    p.add_argument("--no_save_frames", dest="save_frames",
                   action="store_false")
    p.add_argument("--no_use_mp4", dest="use_mp4", action="store_false",
                   help="write .gif instead of .mp4")
    p.add_argument("--no_lookahead_denoising", dest="lookahead_denoising",
                   action="store_false")
    p.add_argument("--fps", type=int, default=10)
    p.add_argument("--unconditional_guidance_scale", type=float, default=12.0)
    p.add_argument("--lookahead_denoising", "-ld", action="store_true",
                   default=True)
    p.add_argument("--eta", "-e", type=float, default=1.0)
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--use_mp4", action="store_true", default=True)
    p.add_argument("--output_fps", type=int, default=10)
    p.add_argument("--prompt_index", type=int, default=0)
    p.add_argument("--use_self_attention", type=bool, default=False)
    p.add_argument("--use_davis", action="store_true", default=False)
    p.add_argument("--davis_root", type=str, default="DAVIS")
    p.add_argument("--video_name", type=str, default=None)
    p.add_argument("--frame_stride", type=int, default=1)
    p.add_argument("--gamma", type=float, default=0.5)
    p.add_argument("--sampling_strategy", type=str, default="uniform",
                   choices=["first", "random", "uniform"])
    p.add_argument("--conditioned_image_path", type=str, default="assets/cats.png")
    # — TPU-native additions —
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    p.add_argument("--bpe_path", type=str, default=None,
                   help="CLIP BPE vocab (or MOCA_TPU_BPE_PATH)")
    p.add_argument("--inject_into_queue", action="store_true", default=False,
                   help="fixed mode: let concept injection reach the FIFO "
                        "queue (the reference computes x_prev before "
                        "injection — see DECISIONS.md)")
    p.add_argument("--multiprompts", nargs="+", default=None,
                   help="multi-scene stream: N prompts followed by ONE "
                        "comma-separated list of N frame counts — the "
                        "convention of fifo_ddim_sampling_multiprompts "
                        "(funcs.py:375-381), which the reference never "
                        "exposed on a CLI")
    p.add_argument("--save_visualizations", action="store_true",
                   default=False,
                   help="dump the reference's per-step artifact set "
                        "(pred_x0/mask/cond PNGs, ddim.py:611-641,849-899) "
                        "host-side; the reference emits these unconditionally "
                        "from inside the denoise loop")
    p.add_argument("--tail_mode", type=str, default="freeinit",
                   choices=["freeinit", "plain"],
                   help="queue-tail refill on shift: freeinit = LPF anchor+"
                        "noise mix (funcs.py:86-99), plain = fresh noise "
                        "(the funcs_mp.py:39-46 multiprocess variant)")
    p.add_argument("--mesh", type=str, default=None, metavar="DP,FIFO",
                   help="shard the FIFO window batch + head decode over a "
                        "(dp, fifo) device mesh, e.g. '1,8' on a v5e-8 — "
                        "the product multi-chip path (the reference forks "
                        "one process per GPU instead, funcs_mp.py:161-254)")
    p.add_argument("--checkpoint_every", type=int, default=0,
                   help="mid-FIFO fault tolerance: snapshot the queue every "
                        "N output frames; a killed run resumes bit-exactly "
                        "(feature absent in the reference)")
    return p


def parse_mesh(args):
    """--mesh 'DP,FIFO' → jax.sharding.Mesh (or None single-chip)."""
    if not getattr(args, "mesh", None):
        return None
    from moca_tpu.parallel.mesh import make_mesh
    dp, fifo = (int(v) for v in args.mesh.split(","))
    return make_mesh((dp, fifo))


def load_pipeline(args) -> MoCAVideoPipeline:
    cfg = load_model_config(args.config, dtype=args.precision)
    assert os.path.exists(args.ckpt_path), \
        f"Error: checkpoint [{args.ckpt_path}] Not Found!"
    log.info("loading checkpoint %s", args.ckpt_path)
    from moca_tpu.io.checkpoint import load_or_convert
    unet_p, vae_p, clip_p = load_or_convert(
        args.ckpt_path, cfg.unet, cfg.vae, cfg.clip)
    model = LatentDiffusion(cfg.unet, cfg.vae, cfg.clip,
                            unet_p, vae_p, clip_p,
                            scale_factor=cfg.diffusion.scale_factor)
    tokenizer = load_tokenizer(args.bpe_path)
    moca = MoCAConfig(gamma=args.gamma,
                      inject_into_queue=args.inject_into_queue)
    return MoCAVideoPipeline(
        model, tokenizer,
        video_length=args.video_length,
        num_partitions=args.num_partitions,
        new_video_length=args.new_video_length,
        guidance_scale=args.unconditional_guidance_scale,
        eta=args.eta, fps=args.fps,
        lookahead_denoising=args.lookahead_denoising,
        moca=moca, use_scale=cfg.diffusion.use_scale,
        checkpoint_every=args.checkpoint_every,
        tail_mode=getattr(args, "tail_mode", "freeinit"),
        uncond_type=cfg.diffusion.uncond_type, mesh=parse_mesh(args))


def set_directory(args, prompt: str, conditioned_image_path: str):
    """Output/latents dir layout (videocrafter_main.py:25-63)."""
    if args.output_dir is None:
        output_dir = f"results/moca_tpu/{prompt[:100]}"
        if args.eta != 1.0:
            output_dir += f"/eta{args.eta}"
        if args.new_video_length != 100:
            output_dir += f"/{args.new_video_length}frames"
    else:
        output_dir = args.output_dir
    latents_dir = (
        f"results/moca_tpu/latents/{args.num_inference_steps}steps/"
        f"{prompt[:100]}/eta{args.eta}")
    stem = os.path.splitext(os.path.basename(conditioned_image_path))[0]
    output_dir = os.path.join(output_dir, stem)
    os.makedirs(output_dir, exist_ok=True)
    os.makedirs(latents_dir, exist_ok=True)
    return output_dir, latents_dir


def main(args):
    args.num_inference_steps = args.video_length * args.num_partitions
    pipe = load_pipeline(args)
    latent_hw = (args.height // 8, args.width // 8)
    root_key = jax.random.PRNGKey(args.seed)

    if args.use_davis:
        assert args.video_name, "--video_name required with --use_davis"
        frames, masks = load_davis_data(
            args.video_name, args.davis_root, video_size=latent_hw,
            video_frames=72, sampling_strategy=args.sampling_strategy)
        prompt = get_davis_prompt(args.video_name) + " cat."
        output_dir, _ = set_directory(args, args.video_name,
                                      args.conditioned_image_path)
        cond_image = load_conditioning_image(
            args.conditioned_image_path, latent_hw)
        key_enc, key_run = jax.random.split(root_key)
        clean = pipe.model.encode_frames(frames[None], rng=key_enc)
        video = pipe(prompt, key_run, cond_image=cond_image,
                     gamma=args.gamma, height=args.height, width=args.width,
                     clean_latents=clean, masks=masks,
                     davis_frames=frames)
        out = os.path.join(output_dir, args.video_name)
        keep = video[: args.new_video_length // 2]  # videocrafter_main.py:172
        save_video(keep, out + (".mp4" if args.use_mp4 else ".gif"),
                   fps=args.output_fps)
        log.info("wrote %s", out)
        return

    prompt_list = load_prompts(args.prompt_file, args.prompt_index)
    indices = list(range(len(prompt_list)))[args.rank :: args.num_processes]
    for idx in indices:
        data = prompt_list[idx]
        prompt = data["prompt"]
        output_dir, latents_dir = set_directory(
            args, prompt, data["conditioned_image_path"])
        cond_image = load_conditioning_image(
            data["conditioned_image_path"], latent_hw)
        frame_cb = None
        viz = None
        from moca_tpu.utils.visualization import VisualizationSink
        if args.save_frames:
            # per-frame PNG dump (funcs.py:362-365 fifo/{i}.png)
            from moca_tpu.io.video import tensor_to_uint8
            sink = VisualizationSink(output_dir)

            def frame_cb(i, frame, _sink=sink):
                _sink.frame(i, tensor_to_uint8(frame))

        if args.save_visualizations:
            viz = VisualizationSink(
                os.path.join(output_dir, "visualizations"))

        multiprompts = None
        if args.multiprompts:
            *mp_prompts, mp_lengths = args.multiprompts
            counts = [int(v) for v in mp_lengths.split(",")]
            assert len(counts) == len(mp_prompts), (
                "--multiprompts needs N prompts + one comma-separated "
                "list of N frame counts")
            multiprompts = list(zip(mp_prompts, counts))

        video = pipe(
            prompt, jax.random.fold_in(root_key, idx),
            cond_image=cond_image,
            conditioned_prompt=data["conditioned_prompt"],
            gamma=data["gamma"],
            height=args.height, width=args.width,
            latents_dir=latents_dir, frame_callback=frame_cb, viz=viz,
            multiprompts=multiprompts)
        out = os.path.join(output_dir, prompt[:100])
        # videocrafter_main.py:230: video_frames[-new_video_length//2:] —
        # the unary minus binds INSIDE the floor division, so odd N keeps
        # ceil(N/2) tail frames (N=7 → 4), not N//2
        keep = video[-args.new_video_length // 2:]
        save_video(keep, out + (".mp4" if args.use_mp4 else ".gif"),
                   fps=args.output_fps)
        log.info("wrote %s", out)


if __name__ == "__main__":
    main(build_parser().parse_args())


def _entry():
    main(build_parser().parse_args())
