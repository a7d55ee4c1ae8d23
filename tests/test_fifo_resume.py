"""Mid-FIFO checkpoint/resume — a fault-tolerance feature the reference
lacks (SURVEY §5.4: resume only from the base-latent cache)."""

import numpy as np
import jax
import pytest

from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline

H = W = 32
F, N = 4, 2


@pytest.fixture(scope="module")
def tiny_model():
    return init_random_model(
        UNetConfig(model_channels=32, num_head_channels=8, context_dim=16,
                   channel_mult=(1, 2), attention_resolutions=(1, 2),
                   num_res_blocks=1, temporal_length=F),
        VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1, resolution=H),
        CLIPTextConfig(width=16, heads=2, layers=2),
        jax.random.PRNGKey(0), latent_hw=(H // 8, W // 8), frames=F)


def _pipe(tiny_model, **kw):
    return MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=4, guidance_scale=7.5, **kw)


def test_resume_seg_mode_reproduces_uninterrupted_run(tiny_model, tmp_path):
    """Open-vocab (mask_provider) kill + resume: the snapshot must carry the
    seg_frame_counter AND the provider's prev_mask — without them the
    temporal-consistency chain (IoU/empty gates vs ddim.py:788-807) and
    PrecomputedMaskProvider indexing silently reset on resume."""
    from moca_tpu.io.segmentation import CallbackMaskProvider

    cond = np.full((H // 8, W // 8, 4), 0.3, np.float32)
    key = jax.random.PRNGKey(11)

    def make_provider():
        def seg(frame, target):
            # stateless fake detector (real ones are per-frame too):
            # content-keyed empty detections exercise the prev_mask gate
            if int(frame.sum()) % 2 == 1:
                return None
            return (frame[:, :, 0] > frame[:, :, 0].mean()).astype(np.float32)
        return CallbackMaskProvider(seg)

    kw = dict(cond_image=cond, gamma=0.5, height=H, width=W, target="cat")
    full = _pipe(tiny_model)(
        "a mouse", key, latents_dir=str(tmp_path / "ref"),
        mask_provider=make_provider(), **kw)

    class Kill(Exception):
        pass

    def killer(i, frame):
        if i == 2:
            raise Kill

    run_dir = tmp_path / "resume"
    pipe = _pipe(tiny_model, checkpoint_every=2, decode_batch=1)
    provider = make_provider()
    with pytest.raises(Kill):
        pipe("a mouse", key, latents_dir=str(run_dir),
             frame_callback=killer, mask_provider=provider, **kw)
    snap = np.load(run_dir / "fifo_state.npz")
    assert "seg_frame_counter" in snap and "seg_prev_mask" in snap
    # async mode (the default): the snapshotted iteration's pred_x0 hasn't
    # been through the provider yet — it must ride the snapshot or the
    # resumed run would skip one detector sweep and diverge
    assert "seg_pending_pred" in snap

    # resume with a FRESH provider (new process): state comes from the snap
    resumed = pipe("a mouse", key, latents_dir=str(run_dir),
                   mask_provider=make_provider(), **kw)
    assert len(resumed) == len(full)
    np.testing.assert_allclose(np.stack(resumed), np.stack(full), atol=1e-5)


def test_resume_reproduces_uninterrupted_run(tiny_model, tmp_path):
    cond = np.full((H // 8, W // 8, 4), 0.2, np.float32)
    key = jax.random.PRNGKey(7)

    ref_dir = tmp_path / "ref"
    full = _pipe(tiny_model)( "a mouse", key, cond_image=cond,
                              height=H, width=W, latents_dir=str(ref_dir))

    # interrupted run: kill after 3 frames via the frame callback
    run_dir = tmp_path / "resume"

    class Kill(Exception):
        pass

    def killer(i, frame):
        if i == 2:
            raise Kill

    pipe = _pipe(tiny_model, checkpoint_every=2, decode_batch=1)
    with pytest.raises(Kill):
        pipe("a mouse", key, cond_image=cond, height=H, width=W,
             latents_dir=str(run_dir), frame_callback=killer)
    assert (run_dir / "fifo_state.npz").exists()

    # resume and finish
    resumed = pipe("a mouse", key, cond_image=cond, height=H, width=W,
                   latents_dir=str(run_dir))
    assert len(resumed) == len(full)
    np.testing.assert_allclose(np.stack(resumed), np.stack(full), atol=1e-5)
    # completed run removes the snapshot
    assert not (run_dir / "fifo_state.npz").exists()
