"""Checkpoint-FILE-level loading e2e: the only seam between "a weights file
lands on disk" and "a video comes out".

Builds a REAL torch state dict at shrunk config — the reference's actual
`UNetModel` + `AutoencoderKL` modules plus the OpenCLIP text replica — and
saves it in the three on-disk formats the reference loader handles
(funcs.py:487-503): plain `{"state_dict": …}`, the DeepSpeed
`{"module": {"_forward_module."+k: …}}` wrapper (16-char prefix strip), and
a `model_ema.*` LitEma-shadow variant. Then drives the UNMOCKED CLI path:
`load_torch_state_dict` → `convert_checkpoint` → `io/checkpoint.
load_or_convert` (orbax cache both miss and hit) → `load_pipeline` →
`MoCAVideoPipeline.__call__` → video file.
"""

import numpy as np
import pytest
import torch

import jax

from tests.oracle import load_reference, randomize_module
from tests.torch_openclip import TextTower

HEIGHT = WIDTH = 32
F, N = 4, 2

UNET_KW = dict(
    in_channels=4, out_channels=4, model_channels=64, num_res_blocks=1,
    attention_resolutions=[1, 2], channel_mult=[1, 2], num_head_channels=32,
    transformer_depth=1, temporal_transformer_depth=1, context_dim=16,
    use_linear=True, temporal_conv=True, tempspatial_aware=False,
    temporal_attention=True, temporal_selfatt_only=True,
    use_relative_position=False, use_causal_attention=False,
    temporal_length=F, addition_attention=False, use_image_attention=False,
    fps_cond=False, dropout=0.0, dims=2,
)
DDCONFIG = dict(
    double_z=True, z_channels=4, resolution=HEIGHT, in_channels=3, out_ch=3,
    ch=32, ch_mult=[1, 1, 2, 2], num_res_blocks=1, attn_resolutions=[],
    dropout=0.0,
)
CLIP_KW = dict(vocab_size=49408, width=16, heads=2, layers=2,
               context_length=77)

TINY_YAML = f"""
model:
  target: lvdm.models.ddpm3d.LatentDiffusion
  params:
    timesteps: 1000
    linear_start: 0.00085
    linear_end: 0.012
    scale_factor: 0.18215
    use_scale: true
    scale_b: 0.7
    uncond_type: empty_seq
    unet_config:
      target: lvdm.modules.networks.openaimodel3d.UNetModel
      params:
        in_channels: 4
        out_channels: 4
        model_channels: 64
        num_res_blocks: 1
        attention_resolutions: [1, 2]
        channel_mult: [1, 2]
        num_head_channels: 32
        transformer_depth: 1
        context_dim: 16
        use_linear: true
        temporal_conv: true
        temporal_attention: true
        temporal_selfatt_only: true
        temporal_length: {F}
        addition_attention: false
        fps_cond: false
    first_stage_config:
      target: lvdm.models.autoencoder.AutoencoderKL
      params:
        embed_dim: 4
        ddconfig:
          double_z: true
          z_channels: 4
          resolution: {HEIGHT}
          in_channels: 3
          out_ch: 3
          ch: 32
          ch_mult: [1, 1, 2, 2]
          num_res_blocks: 1
          attn_resolutions: []
    cond_stage_config:
      target: lvdm.modules.encoders.condition.FrozenOpenCLIPEmbedder
      params:
        layer: penultimate
        width: 16
        heads: 2
        layers: 2
        vocab_size: 49408
"""


@pytest.fixture(scope="module")
def torch_sd():
    """Full LatentDiffusion state dict with the reference's key prefixes
    (model.diffusion_model / first_stage_model / cond_stage_model.model)."""
    ref = load_reference()
    unet = randomize_module(ref.openaimodel3d.UNetModel(**UNET_KW), seed=60)
    vae = randomize_module(ref.autoencoder.AutoencoderKL(
        ddconfig=DDCONFIG, lossconfig={"target": "torch.nn.Identity"},
        embed_dim=4), seed=61, scale=0.05)
    clip = randomize_module(TextTower(**CLIP_KW), seed=62)
    sd = {}
    sd.update({f"model.diffusion_model.{k}": v
               for k, v in unet.state_dict().items()})
    sd.update({f"first_stage_model.{k}": v
               for k, v in vae.state_dict().items()})
    sd.update({f"cond_stage_model.model.{k}": v
               for k, v in clip.state_dict().items()})
    return sd


@pytest.fixture(scope="module")
def tiny_bpe(tmp_path_factory):
    import gzip

    path = tmp_path_factory.mktemp("bpe") / "vocab.txt.gz"
    with gzip.open(path, "wt", encoding="utf-8") as f:
        f.write("version\nc a\nca t</w>\nd o\ndo g</w>\n")
    return str(path)


def _leaf_count(tree):
    return len(jax.tree.leaves(tree))


def test_plain_vs_deepspeed_format(torch_sd, tmp_path):
    """funcs.py:487-503: both wrapper formats must convert to identical
    trees (the DeepSpeed 'module' dict strips a 16-char key prefix)."""
    from moca_tpu.config import model_config_from_dict
    from moca_tpu.models.convert import convert_checkpoint
    import yaml

    cfg = model_config_from_dict(yaml.safe_load(TINY_YAML))
    plain = tmp_path / "plain.ckpt"
    deep = tmp_path / "deepspeed.ckpt"
    torch.save({"state_dict": torch_sd}, plain)
    assert len("_forward_module.") == 16  # the prefix the loader strips
    torch.save(
        {"module": {f"_forward_module.{k}": v for k, v in torch_sd.items()}},
        deep)

    trees_p = convert_checkpoint(str(plain), cfg.unet, cfg.vae, cfg.clip)
    trees_d = convert_checkpoint(str(deep), cfg.unet, cfg.vae, cfg.clip)
    for tp, td in zip(trees_p, trees_d):
        assert _leaf_count(tp) == _leaf_count(td)
        for a, b in zip(jax.tree.leaves(tp), jax.tree.leaves(td)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_shadow_variant(torch_sd, tmp_path):
    """use_ema overlays LitEma's name-mangled shadow buffers (lvdm/ema.py
    strips dots from param names): EMA values (param + 1 here) must land in
    the converted U-Net; non-EMA load must keep the originals."""
    from moca_tpu.config import model_config_from_dict
    from moca_tpu.models.convert import convert_checkpoint
    import yaml

    cfg = model_config_from_dict(yaml.safe_load(TINY_YAML))
    sd = dict(torch_sd)
    for k, v in list(torch_sd.items()):
        if k.startswith("model.") and v.dtype.is_floating_point:
            mangled = k[len("model."):].replace(".", "")
            sd[f"model_ema.{mangled}"] = v + 1.0
    sd["model_ema.decay"] = torch.tensor(0.9999)
    sd["model_ema.num_updates"] = torch.tensor(10)
    path = tmp_path / "ema.ckpt"
    torch.save({"state_dict": sd}, path)

    unet_p, _, _ = convert_checkpoint(str(path), cfg.unet, cfg.vae, cfg.clip)
    unet_e, _, _ = convert_checkpoint(str(path), cfg.unet, cfg.vae, cfg.clip,
                                      use_ema=True)
    base = jax.tree.leaves(unet_p)
    ema = jax.tree.leaves(unet_e)
    deltas = [float(np.mean(np.asarray(b) - np.asarray(a)))
              for a, b in zip(base, ema)]
    np.testing.assert_allclose(deltas, 1.0, atol=1e-5)


def test_cli_checkpoint_to_video_e2e(torch_sd, tiny_bpe, tmp_path,
                                     monkeypatch):
    """The unmocked product path: torch .ckpt on disk → load_pipeline
    (convert + orbax cache write) → FIFO stream → video file; second run
    hits the orbax cache instead of re-converting."""
    from PIL import Image
    import moca_tpu.cli.main as cli_main
    import moca_tpu.io.checkpoint as ckpt_mod

    monkeypatch.chdir(tmp_path)
    ckpt = tmp_path / "model.ckpt"
    torch.save({"state_dict": torch_sd}, ckpt)
    cfg_yaml = tmp_path / "tiny.yaml"
    cfg_yaml.write_text(TINY_YAML)
    cond = tmp_path / "cat.png"
    Image.fromarray(np.full((16, 16, 4), 128, np.uint8), "RGBA").save(cond)
    csv = tmp_path / "prompts.csv"
    csv.write_text(
        "prompt,conditioned_object,conditioned_image_path,"
        "conditioned_prompt,gamma\n"
        f"a cat dog,cat,{cond},cat,0.4\n")
    out_root = tmp_path / "out"
    argv = ["--ckpt_path", str(ckpt), "--config", str(cfg_yaml),
            "--bpe_path", tiny_bpe,
            "--height", str(HEIGHT), "--width", str(WIDTH),
            "--video_length", str(F), "-n", str(N), "-l", "2",
            "--prompt_file", str(csv), "--output_dir", str(out_root),
            "--no_save_frames", "--precision", "fp32"]
    args = cli_main.build_parser().parse_args(argv)
    args.num_inference_steps = F * N
    pipe = cli_main.load_pipeline(args)
    # orbax cache written next to the ckpt on first conversion
    caches = list(tmp_path.glob(".moca_tpu_flax_model.ckpt_*"))
    assert caches, "orbax cache not written"

    cli_main.main(args)
    vid = out_root / "cat" / "a cat dog.mp4"
    assert vid.exists() and vid.stat().st_size > 0

    # second load takes the cache path (convert_checkpoint must NOT run)
    def boom(*a, **k):
        raise AssertionError("cache miss: convert_checkpoint re-ran")

    import moca_tpu.models.convert as convert_mod
    monkeypatch.setattr(convert_mod, "convert_checkpoint", boom)
    pipe2 = cli_main.load_pipeline(args)
    a = jax.tree.leaves(pipe.model.unet_params)[0]
    b = jax.tree.leaves(pipe2.model.unet_params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
