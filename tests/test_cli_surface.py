"""CLI flag-surface parity with the reference (videocrafter_main.py:236-269)."""

from moca_tpu.cli.main import build_parser


REFERENCE_DEFAULTS = {
    # flag: default (videocrafter_main.py argparse)
    "ckpt_path": "videocrafter_models/base_512_v2/model.ckpt",
    "config": "configs/inference_t2v_512_v2.0.yaml",
    "seed": 321,
    "video_length": 16,
    "num_partitions": 4,
    "prompt_file": "prompts/prompts.csv",
    "new_video_length": 100,
    "num_processes": 1,
    "rank": 0,
    "height": 320,
    "width": 512,
    "fps": 10,
    "unconditional_guidance_scale": 12.0,
    "lookahead_denoising": True,
    "eta": 1.0,
    "output_dir": None,
    "use_mp4": True,
    "output_fps": 10,
    "prompt_index": 0,
    "use_davis": False,
    "davis_root": "DAVIS",
    "video_name": None,
    "frame_stride": 1,
    "gamma": 0.5,
    "sampling_strategy": "uniform",
    "conditioned_image_path": "assets/cats.png",
}


def test_cli_defaults_match_reference():
    args = build_parser().parse_args([])
    for flag, want in REFERENCE_DEFAULTS.items():
        assert getattr(args, flag) == want, flag


def test_num_inference_steps_forced_to_f_times_n():
    # videocrafter_main.py:273
    args = build_parser().parse_args(
        ["--video_length", "8", "--num_partitions", "3"])
    args.num_inference_steps = args.video_length * args.num_partitions
    assert args.num_inference_steps == 24


def test_no_negations_disable_store_true_defaults():
    """The reference's --save_frames/--use_mp4/-ld are store_true with
    default=True — impossible to disable (videocrafter_main.py:249-252).
    Divergence: --no_* negations actually turn them off."""
    args = build_parser().parse_args(
        ["--no_save_frames", "--no_use_mp4", "--no_lookahead_denoising"])
    assert args.save_frames is False
    assert args.use_mp4 is False
    assert args.lookahead_denoising is False
    # positive flags still work and defaults stay reference-faithful
    args = build_parser().parse_args([])
    assert (args.save_frames, args.use_mp4, args.lookahead_denoising) == (
        True, True, True)


def test_positive_flags_explicitly():
    """The registration ORDER of the duplicate declarations is load-bearing
    (--save_frames registered before --no_save_frames shares the dest):
    passing the positive reference spellings must keep/force True, and a
    positive flag must override a preceding negation."""
    args = build_parser().parse_args(["--save_frames", "--use_mp4", "-ld"])
    assert (args.save_frames, args.use_mp4, args.lookahead_denoising) == (
        True, True, True)
    args = build_parser().parse_args(
        ["--no_use_mp4", "--use_mp4", "--no_save_frames", "--save_frames",
         "--no_lookahead_denoising", "--lookahead_denoising"])
    assert (args.save_frames, args.use_mp4, args.lookahead_denoising) == (
        True, True, True)


def test_tail_mode_flag():
    assert build_parser().parse_args([]).tail_mode == "freeinit"
    assert build_parser().parse_args(
        ["--tail_mode", "plain"]).tail_mode == "plain"
