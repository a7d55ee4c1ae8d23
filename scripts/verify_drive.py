"""Verification drive: the moca_tpu library surface, end to end.

Builds a tiny random-weight model through the PUBLIC package exports,
runs the full MoCA semantic-mixing pipeline (base DDIM → FIFO queue →
momentum+injection → streaming decode), and writes a real .mp4/.gif with the
io layer — the same path the CLI takes after checkpoint conversion.
"""
import os, sys, time
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
sys.path.insert(0, "/root/repo")

import numpy as np
import jax
# the axon plugin overrides JAX_PLATFORMS — force via config
jax.config.update("jax_platforms", "cpu")

from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig
from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline
from moca_tpu.io.video import save_video, tensor_to_uint8

t0 = time.time()
H = W = 32
F, N = 4, 2
unet_cfg = UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                      channel_mult=(1, 2), attention_resolutions=(1, 2),
                      num_res_blocks=1, temporal_length=F)
vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1, resolution=H)
clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2)
model = init_random_model(unet_cfg, vae_cfg, clip_cfg, jax.random.PRNGKey(0),
                          latent_hw=(H // 8, W // 8), frames=F)
print(f"[{time.time()-t0:6.1f}s] model built")

pipe = MoCAVideoPipeline(model, HashTokenizer(), video_length=F,
                         num_partitions=N, new_video_length=4,
                         guidance_scale=7.5)
cond = np.full((H // 8, W // 8, 4), 0.3, np.float32)
frames = pipe("a mouse running", jax.random.PRNGKey(1), cond_image=cond,
              conditioned_prompt="a cat", gamma=0.7, height=H, width=W,
              latents_dir="/tmp/verify_latents")
print(f"[{time.time()-t0:6.1f}s] pipeline produced {len(frames)} frames, "
      f"shape {frames[0].shape}, finite={all(np.isfinite(f).all() for f in frames)}")

save_video(frames, "/tmp/verify_out.mp4", fps=8)
save_video(frames, "/tmp/verify_out.gif", fps=8)
print(f"[{time.time()-t0:6.1f}s] wrote /tmp/verify_out.mp4 "
      f"({os.path.getsize('/tmp/verify_out.mp4')} bytes) and .gif "
      f"({os.path.getsize('/tmp/verify_out.gif')} bytes)")

# resume contract: second run reuses the cached base latents
t1 = time.time()
frames2 = pipe("a mouse running", jax.random.PRNGKey(1), cond_image=cond,
               conditioned_prompt="a cat", gamma=0.7, height=H, width=W,
               latents_dir="/tmp/verify_latents")
print(f"[{time.time()-t0:6.1f}s] cached rerun took {time.time()-t1:.1f}s; "
      f"identical={np.allclose(np.stack(frames), np.stack(frames2))}")

# probe: gamma must change the pred_x0 blend but (faithful mode) not the queue
frames3 = pipe("a mouse running", jax.random.PRNGKey(1), cond_image=cond,
               conditioned_prompt="a cat", gamma=0.0, height=H, width=W,
               latents_dir="/tmp/verify_latents")
print(f"[{time.time()-t0:6.1f}s] gamma=0 vs 0.7 frames differ: "
      f"{not np.allclose(np.stack(frames), np.stack(frames3))}")

u8 = tensor_to_uint8(frames[0])
print(f"frame0 uint8 range: [{u8.min()}, {u8.max()}]")
print("DRIVE OK")
