"""Open-vocabulary segmentation: provider gates + e2e through the pipeline.

The reference runs Grounding-DINO+SAM2 inside the denoise loop
(ref: lvdm/models/samplers/ddim.py:592-606,739-903); here a host-side
provider feeds a queue-aligned mask tensor. These tests drive a FAKE
detector through the actual `MoCAVideoPipeline` seg path and unit-test the
reference's temporal-consistency gates (empty-detection fallback, IoU drift
gate, coverage skip) and the latent→uint8 conversion (ddim.py:744-763).
"""

import numpy as np
import jax
import pytest

from moca_tpu.io.segmentation import (
    CallbackMaskProvider, PrecomputedMaskProvider, latent_to_uint8_frame,
    mask_iou,
)
from moca_tpu.models.clip_text import CLIPTextConfig
from moca_tpu.models.latent_diffusion import init_random_model
from moca_tpu.models.tokenizer import HashTokenizer
from moca_tpu.models.unet3d import UNetConfig
from moca_tpu.models.vae import VAEConfig
from moca_tpu.pipelines.moca_video import MoCAVideoPipeline
from moca_tpu.sampling.moca import MoCAConfig


# ---------------------------------------------------------------------------
# unit: mask_iou + conversion
# ---------------------------------------------------------------------------

def test_mask_iou_basic():
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[1:3] = 1
    assert mask_iou(a, a) == 1.0
    assert mask_iou(a, 1 - a) == 0.0
    np.testing.assert_allclose(mask_iou(a, b), 4 / 12)
    # empty ∧ empty → 1 (ddim.py:905-943 degenerate case)
    assert mask_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0


def test_latent_to_uint8_conversion():
    # 4-channel latent → first 3 channels (ddim.py:751-755)
    lat = np.zeros((5, 6, 4), np.float32)
    lat[..., 0] = 0.5
    frame = latent_to_uint8_frame(lat)
    assert frame.shape == (5, 6, 3) and frame.dtype == np.uint8
    # max ≤ 1 → ×255 branch (ddim.py:758-760)
    assert frame[..., 0].max() == 127
    # max > 1 → direct cast branch (ddim.py:761-762)
    lat2 = np.full((2, 2, 3), 3.7, np.float32)
    assert latent_to_uint8_frame(lat2).max() == 3
    # single channel → repeat to 3
    assert latent_to_uint8_frame(np.ones((2, 2, 1))).shape == (2, 2, 3)


# ---------------------------------------------------------------------------
# unit: provider gates (ddim.py:788-821 semantics)
# ---------------------------------------------------------------------------

def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[:h, :w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2 <= r * r).astype(np.float32)


def test_provider_empty_detection_falls_back_to_previous():
    masks = [_disk(8, 8, 4, 4, 2), None, None]
    calls = iter(masks)
    p = CallbackMaskProvider(lambda frame, target: next(calls))
    m0 = p(0, np.zeros((8, 8, 3), np.uint8), "cat")
    m1 = p(1, np.zeros((8, 8, 3), np.uint8), "cat")
    m2 = p(2, np.zeros((8, 8, 3), np.uint8), "cat")
    assert m0 is not None
    np.testing.assert_array_equal(m1, m0)   # ddim.py:788-793
    np.testing.assert_array_equal(m2, m0)


def test_provider_iou_drift_gate_reuses_previous():
    stable = _disk(8, 8, 4, 4, 2)
    jumped = _disk(8, 8, 1, 1, 1)           # IoU(stable, jumped) ≈ 0
    calls = iter([stable, jumped])
    p = CallbackMaskProvider(lambda frame, target: next(calls))
    m0 = p(0, np.zeros((8, 8, 3), np.uint8), "cat")
    m1 = p(1, np.zeros((8, 8, 3), np.uint8), "cat")
    np.testing.assert_array_equal(m1, stable)  # drift gate ddim.py:803-807


def test_provider_coverage_gate_skips_but_carries():
    big = np.ones((8, 8), np.float32)        # covers 100 % > 80 %
    calls = iter([big, None])
    p = CallbackMaskProvider(lambda frame, target: next(calls))
    assert p(0, np.zeros((8, 8, 3), np.uint8), "cat") is None  # skip paste
    # the oversized mask still became pre_masks (ddim.py:606 carries it) but
    # remains coverage-gated on reuse
    assert p(1, np.zeros((8, 8, 3), np.uint8), "cat") is None
    np.testing.assert_array_equal(p.prev_mask, big)


def test_provider_appends_period_to_target():
    seen = {}

    def seg(frame, target):
        seen["target"] = target
        return None

    CallbackMaskProvider(seg)(0, np.zeros((4, 4, 3), np.uint8), "cat")
    assert seen["target"] == "cat."          # ddim.py:741-742


def test_precomputed_provider_loops_last():
    masks = np.stack([np.full((4, 4), i, np.float32) for i in range(3)])
    p = PrecomputedMaskProvider(masks)
    assert p(1)[0, 0] == 1
    assert p(99)[0, 0] == 2


# ---------------------------------------------------------------------------
# e2e: fake detector through the actual pipeline
# ---------------------------------------------------------------------------

HEIGHT = WIDTH = 32
F, N = 4, 2


@pytest.fixture(scope="module")
def tiny_model():
    unet_cfg = UNetConfig(
        model_channels=32, num_head_channels=8, context_dim=16,
        channel_mult=(1, 2), attention_resolutions=(1, 2),
        num_res_blocks=1, temporal_length=F)
    vae_cfg = VAEConfig(ch=16, ch_mult=(1, 1, 2, 2), num_res_blocks=1,
                        resolution=HEIGHT)
    clip_cfg = CLIPTextConfig(width=16, heads=2, layers=2, vocab_size=49408)
    return init_random_model(
        unet_cfg, vae_cfg, clip_cfg, jax.random.PRNGKey(0),
        latent_hw=(HEIGHT // 8, WIDTH // 8), frames=F)


def _run(tiny_model, provider, key=3, pipe_kw=None, **call_kw):
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5,
        moca=MoCAConfig(inject_into_queue=True), **(pipe_kw or {}))
    h, w = HEIGHT // 8, WIDTH // 8
    cond = np.full((h, w, 4), 0.4, np.float32)
    frames = pipe("a dog", jax.random.PRNGKey(key), cond_image=cond,
                  height=HEIGHT, width=WIDTH, mask_provider=provider,
                  target="cat", **call_kw)
    return pipe, np.stack(frames)


def test_prompt_mode_open_vocab_injection_changes_output(tiny_model):
    """Prompt mode WITHOUT DAVIS masks: a detector that always finds the
    subject must change the generated frames (vs no provider), proving the
    mask tensor reaches the injection — the reference's flagship demo path."""
    record = []

    def fake_detector(frame, target):
        assert frame.dtype == np.uint8 and frame.shape[-1] == 3
        record.append(target)
        m = np.zeros(frame.shape[:2], np.float32)
        m[1:3, 1:3] = 1.0
        return m

    _, frames_seg = _run(tiny_model, CallbackMaskProvider(fake_detector))
    pipe, frames_plain = _run(tiny_model, None)
    assert record and all(t == "cat." for t in record)
    # provider is called once per t≤300 slot per iteration
    total_iters = 3 + F * N - F
    k_low = pipe._num_low_t_slots()
    assert k_low > 0
    assert len(record) == total_iters * k_low
    assert frames_seg.shape == frames_plain.shape
    assert np.abs(frames_seg - frames_plain).max() > 1e-6


def test_open_vocab_empty_detections_are_noop(tiny_model):
    """A detector that never fires must leave frames bit-identical to the
    no-provider run (empty-detection path: no previous mask → no injection)."""
    _, frames_seg = _run(
        tiny_model, CallbackMaskProvider(lambda frame, target: None), key=5)
    _, frames_plain = _run(tiny_model, None, key=5)
    np.testing.assert_array_equal(frames_seg, frames_plain)


def test_davis_masks_take_precedence_over_provider(tiny_model):
    """When DAVIS masks are given the provider must not be consulted
    (reference: the davis_masks branch short-circuits apply_cond_img,
    ddim.py:565-606)."""
    calls = []

    def fake_detector(frame, target):
        calls.append(1)
        return None

    h, w = HEIGHT // 8, WIDTH // 8
    masks = np.zeros((6, h, w), np.float32)
    masks[:, :2, :2] = 1.0
    clean = jax.random.normal(jax.random.PRNGKey(7), (1, 6, h, w, 4))
    _run(tiny_model, CallbackMaskProvider(fake_detector), key=7,
         clean_latents=clean, masks=masks)
    assert not calls


# ---------------------------------------------------------------------------
# async provider scheduling (MoCAVideoPipeline.seg_async)
# ---------------------------------------------------------------------------

def test_pull_masks_lag_placement(tiny_model):
    """A mask detected at queue slot j lands at slot j-lag of the consuming
    queue (the queue shifts `lag` times in between); slots that shift out
    are dropped with their frames."""
    import jax.numpy as jnp

    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5)
    h, w = HEIGHT // 8, WIDTH // 8
    k_low = pipe._num_low_t_slots()
    assert k_low >= 3  # the lag placement needs a few low-t slots to show
    pred = jnp.asarray(
        np.random.default_rng(0).normal(size=(1, k_low, h, w, 4)),
        jnp.float32)

    def seg(frame, target):
        m = np.zeros(frame.shape[:2], np.float32)
        m[:2, :2] = 1.0  # partial — a full mask trips the 80% coverage gate
        return m

    for lag in (1, 2):
        masks, counter = pipe._pull_masks(
            pred, CallbackMaskProvider(seg), "cat", 0, (h, w), lag=lag)
        m = np.asarray(masks)[0, :, :, :, 0]
        filled = [j for j in range(pipe.plan.queue_length) if m[j].any()]
        assert filled == list(range(k_low - lag)), (lag, filled)
        assert counter == k_low


@pytest.mark.parametrize("seg_async,expected_dispatches", [(True, 2),
                                                           (False, 1)])
def test_seg_async_dispatches_before_provider(tiny_model, seg_async,
                                              expected_dispatches):
    """The point of seg_async: iteration i+1 must be DISPATCHED before the
    provider consumes iteration i's pred_x0 (so detector latency overlaps
    device compute). Sync mode serializes: one dispatch, then the provider.
    Deterministic structural check — no wall-clock flakiness."""
    events = []

    def seg(frame, target):
        events.append("provider")
        return np.ones(frame.shape[:2], np.float32)

    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5, seg_async=seg_async)
    inner = type(pipe)._fifo_iteration

    def logged(*a, **kw):
        events.append("dispatch")
        return inner(pipe, *a, **kw)

    pipe._fifo_iteration = logged  # instance attr shadows the class method
    h, w = HEIGHT // 8, WIDTH // 8
    pipe("a dog", jax.random.PRNGKey(3),
         cond_image=np.full((h, w, 4), 0.4, np.float32),
         height=HEIGHT, width=WIDTH,
         mask_provider=CallbackMaskProvider(seg), target="cat")
    first_provider = events.index("provider")
    assert events[:first_provider].count("dispatch") == expected_dispatches
    # every low-t slot of every iteration was segmented in both modes
    # (async drains the final pending pred after the loop)
    total_iters = 3 + F * N - F
    assert events.count("provider") == total_iters * pipe._num_low_t_slots()


def test_seg_async_changes_mask_timing(tiny_model):
    """lag 2 vs lag 1 lands masks one iteration later — with a firing
    detector the outputs must differ; with a silent detector the two modes
    are bit-identical (no mask ever lands)."""
    def firing(frame, target):
        m = np.zeros(frame.shape[:2], np.float32)
        m[:2, :2] = 1.0  # partial — a full mask trips the 80% coverage gate
        return m

    silent = lambda frame, target: None

    _, f_async = _run(tiny_model, CallbackMaskProvider(firing), key=9,
                      pipe_kw=dict(seg_async=True))
    _, f_sync = _run(tiny_model, CallbackMaskProvider(firing), key=9,
                     pipe_kw=dict(seg_async=False))
    assert np.abs(f_async - f_sync).max() > 1e-6

    _, e_async = _run(tiny_model, CallbackMaskProvider(silent), key=9,
                      pipe_kw=dict(seg_async=True))
    _, e_sync = _run(tiny_model, CallbackMaskProvider(silent), key=9,
                     pipe_kw=dict(seg_async=False))
    np.testing.assert_array_equal(e_async, e_sync)


@pytest.mark.parametrize("seg_async,lag", [(True, 2), (False, 1)])
def test_mask_lag_slot_boundary(tiny_model, seg_async, lag):
    """Slot-level consequence of the provider lag (r4 verdict weak #4):
    detections at queue slots j < lag are dropped, so the consuming
    queue's TOP `lag` t≤300 slots never carry masks — a frame crossing
    the t≤inject_threshold boundary (entering slot k_low-1) gets its
    first injection opportunity exactly `lag` iterations later, once it
    has shifted down to slot k_low-1-lag. Asserted on the actual mask
    queue each dispatched iteration consumes (DECISIONS #13; the
    reference segments every low-t frame with zero lag, ddim.py:592-606)."""
    masks_seen = []
    pipe = MoCAVideoPipeline(
        tiny_model, HashTokenizer(), video_length=F, num_partitions=N,
        new_video_length=3, guidance_scale=7.5,
        moca=MoCAConfig(inject_into_queue=True), seg_async=seg_async)
    inner = type(pipe)._fifo_iteration

    def logged(params, latents, contexts, cond, masks, *a, **kw):
        masks_seen.append(None if masks is None else np.asarray(masks))
        return inner(pipe, params, latents, contexts, cond, masks, *a, **kw)

    pipe._fifo_iteration = logged  # instance attr shadows the class method

    def seg(frame, target):
        m = np.zeros(frame.shape[:2], np.float32)
        m[:2, :2] = 1.0  # partial — a full mask trips the 80% coverage gate
        return m

    h, w = HEIGHT // 8, WIDTH // 8
    pipe("a dog", jax.random.PRNGKey(11),
         cond_image=np.full((h, w, 4), 0.4, np.float32),
         height=HEIGHT, width=WIDTH,
         mask_provider=CallbackMaskProvider(seg), target="cat")

    k_low = pipe._num_low_t_slots()
    total_iters = 3 + F * N - F
    assert len(masks_seen) == total_iters
    # the first `lag` dispatches consume an all-zero mask queue (nothing
    # has been through the provider yet)
    for m in masks_seen[:lag]:
        assert not m.any()
    # every later dispatch consumes masks in EXACTLY slots [0, k_low-lag):
    # the top `lag` low-t slots (and everything above) stay mask-free
    for m in masks_seen[lag:]:
        filled = {j for j in range(pipe.plan.queue_length) if m[0, j].any()}
        assert filled == set(range(k_low - lag)), (lag, sorted(filled))
