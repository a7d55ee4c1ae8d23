"""FIFO queue geometry + the parallel-window ≡ sequential-sweep equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from moca_tpu import schedule
from moca_tpu.sampling import fifo
from moca_tpu.sampling.moca import MoCAConfig


F, N = 4, 2  # f frames per window, n partitions → S = 8 DDIM steps


@pytest.fixture(scope="module")
def sch():
    return schedule.make_schedule(ddim_num_steps=F * N, ddim_eta=1.0)


def _plan(sch, lookahead=True):
    return fifo.make_fifo_plan(np.asarray(sch.ddim_timesteps), F, N, lookahead)


def test_plan_geometry_lookahead(sch):
    plan = _plan(sch, True)
    assert plan.queue_length == F * N + F // 2
    assert plan.num_windows == 2 * N
    np.testing.assert_array_equal(plan.window_starts, np.arange(2 * N) * (F // 2))
    # prefix: f/2 copies of the cleanest timestep & index 0 (funcs.py:292-294)
    ts = np.asarray(sch.ddim_timesteps)
    np.testing.assert_array_equal(plan.timesteps[: F // 2], ts[0])
    np.testing.assert_array_equal(plan.indices[: F // 2], 0)
    np.testing.assert_array_equal(plan.timesteps[F // 2 :], ts)
    assert plan.head_slot == F // 2
    # windows tile the queue
    assert plan.window_starts[-1] + F == plan.queue_length


def test_plan_geometry_no_lookahead(sch):
    plan = _plan(sch, False)
    assert plan.queue_length == F * N
    assert plan.num_windows == N
    assert plan.head_slot == 0


def test_queue_frame_indices_reference_formula(sch):
    plan = _plan(sch, True)
    # 16-frame source, S=8 → T0>S case degenerates; use T0 = 3 < S = 8
    frame_idx, idx = fifo.queue_frame_indices(plan, 3)
    S = 8
    expect = [max(0, i - (S - 3)) for i in range(S)]
    np.testing.assert_array_equal(frame_idx[F // 2 :], expect)
    np.testing.assert_array_equal(frame_idx[: F // 2], 0)
    np.testing.assert_array_equal(idx[F // 2 :], np.arange(S))


def test_prepare_queue_deterministic_and_scaled(sch):
    plan = _plan(sch, True)
    clean = jnp.ones((1, 3, 4, 4, 2)) * 2.0
    key = jax.random.PRNGKey(7)
    q1 = fifo.prepare_queue(sch, plan, clean, key)
    q2 = fifo.prepare_queue(sch, plan, clean, key)
    assert q1.shape == (1, plan.queue_length, 4, 4, 2)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    # slot mean ≈ sqrt(alpha_i)·2 (noise is zero-mean)
    _, idx = fifo.queue_frame_indices(plan, 3)
    alphas = np.asarray(sch.ddim_alphas)[idx]
    means = np.asarray(q1).mean(axis=(0, 2, 3, 4))
    np.testing.assert_allclose(means, np.sqrt(alphas) * 2.0, atol=0.6)


def _sequential_sweep(latents, plan, window_op):
    """Reference semantics: reversed rank order, immediate write-back
    (funcs.py:306-354). window_op(window[B,f,...], rank) -> x_prev."""
    lat = np.array(latents)
    half = plan.f // 2
    for rank in reversed(range(plan.num_windows)):
        start = plan.window_starts[rank]
        end = start + plan.f
        window = lat[:, start:end].copy()
        out = window_op(window, rank)
        if plan.lookahead:
            lat[:, start + half : end] = out[:, half:]
        else:
            lat[:, start:end] = out
    return lat


@pytest.mark.parametrize("lookahead", [True, False])
def test_parallel_snapshot_equals_sequential_sweep(sch, lookahead):
    """The core TPU design claim: batching all windows from a snapshot is
    bit-identical to the reference's reversed sequential sweep."""
    plan = _plan(sch, lookahead)
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(1, plan.queue_length, 2, 2, 1)).astype(np.float32)

    def window_op(window, rank):
        # deterministic nonlinear function of the window content
        return window * 0.5 + np.tanh(window) * (rank + 1) * 0.1

    seq = _sequential_sweep(latents, plan, window_op)

    windows = np.stack(
        [latents[:, s : s + plan.f] for s in plan.window_starts], axis=0
    )
    outs = np.stack(
        [window_op(windows[r], r) for r in range(plan.num_windows)], axis=0
    )
    par = np.asarray(
        fifo._scatter_windows(jnp.asarray(latents), jnp.asarray(outs), plan)
    )
    np.testing.assert_allclose(par, seq, rtol=1e-6)


@pytest.mark.parametrize("f,n", [(4, 2), (8, 2), (8, 4), (16, 4), (4, 6),
                                 (12, 3), (2, 2)])
@pytest.mark.parametrize("lookahead", [True, False])
def test_plan_and_scatter_geometry_fuzz(f, n, lookahead):
    """Geometry fuzz over (f, n, lookahead): the plan invariants, the
    reference queue-index formula (funcs.py:63-77), and the
    parallel-scatter ≡ reversed-sequential-sweep equivalence
    (funcs.py:306-354) must hold at EVERY geometry, not just the f=4/n=2
    unit case and the f=16/n=4 flagship."""
    s = schedule.make_schedule(ddim_num_steps=f * n, ddim_eta=1.0)
    ts = np.asarray(s.ddim_timesteps)
    plan = fifo.make_fifo_plan(ts, f, n, lookahead)
    S, half = f * n, f // 2

    # -- plan invariants
    assert plan.queue_length == S + (half if lookahead else 0)
    assert plan.num_windows == (2 * n if lookahead else n)
    assert plan.head_slot == (half if lookahead else 0)
    step = half if lookahead else f
    np.testing.assert_array_equal(plan.window_starts,
                                  np.arange(plan.num_windows) * step)
    assert plan.window_starts[-1] + f == plan.queue_length
    if lookahead:
        np.testing.assert_array_equal(plan.timesteps[:half], ts[0])
        np.testing.assert_array_equal(plan.indices[:half], 0)
        np.testing.assert_array_equal(plan.timesteps[half:], ts)

    # -- reference queue-index formula at several source lengths
    for t0 in (1, max(1, S // 2), S, S + 3):
        frame_idx, idx = fifo.queue_frame_indices(plan, t0)
        expect = [min(max(0, i - (S - t0)), t0 - 1) for i in range(S)]
        body = frame_idx[half:] if lookahead else frame_idx
        np.testing.assert_array_equal(body, expect)

    # -- scatter ≡ reversed sequential sweep
    rng = np.random.default_rng(f * 100 + n)
    latents = rng.normal(
        size=(1, plan.queue_length, 2, 2, 1)).astype(np.float32)

    def window_op(window, rank):
        return window * 0.5 + np.tanh(window) * (rank + 1) * 0.1

    seq = _sequential_sweep(latents, plan, window_op)
    windows = np.stack(
        [latents[:, s0 : s0 + f] for s0 in plan.window_starts], axis=0)
    outs = np.stack(
        [window_op(windows[r], r) for r in range(plan.num_windows)], axis=0)
    par = np.asarray(
        fifo._scatter_windows(jnp.asarray(latents), jnp.asarray(outs), plan))
    np.testing.assert_allclose(par, seq, rtol=1e-6)


def test_fifo_step_smoke(sch):
    plan = _plan(sch, True)
    B, h, w, C = 1, 4, 4, 2
    latents = jax.random.normal(
        jax.random.PRNGKey(0), (B, plan.queue_length, h, w, C))
    masks = (jax.random.uniform(
        jax.random.PRNGKey(1), (B, plan.queue_length, h, w, 1)) > 0.5
    ).astype(jnp.float32)
    cond_image = jnp.ones((h, w, C)) * 0.3

    def eps_fn(x, t):
        return x * 0.1  # dummy denoiser

    new_latents, head = fifo.fifo_step(
        eps_fn, sch, plan, MoCAConfig(), latents, jax.random.PRNGKey(2),
        cond_image=cond_image, masks=masks,
    )
    assert new_latents.shape == latents.shape
    assert head.shape == (B, h, w, C)
    assert np.isfinite(np.asarray(new_latents)).all()
    # lookahead prefix is immutable (funcs.py:351-352)
    np.testing.assert_array_equal(
        np.asarray(new_latents[:, : F // 2]), np.asarray(latents[:, : F // 2]))


def test_shift_queue(sch):
    B, Q, h, w, C = 1, 6, 4, 4, 2
    latents = jax.random.normal(jax.random.PRNGKey(0), (B, Q, h, w, C))
    out = fifo.shift_queue(latents, jax.random.PRNGKey(1))
    assert out.shape == latents.shape
    # slots shift left by one (funcs.py:91)
    np.testing.assert_array_equal(np.asarray(out[:, :-1]), np.asarray(latents[:, 1:]))
    # new tail is a fresh draw, not a copy
    assert not np.allclose(np.asarray(out[:, -1]), np.asarray(latents[:, -1]))


def test_shift_queue_plain_tail(sch):
    """tail_mode='plain' is the funcs_mp.py:39-46 variant: pure fresh
    noise, no FreeInit mix, anchor ignored."""
    B, Q, h, w, C = 1, 6, 4, 4, 2
    latents = jax.random.normal(jax.random.PRNGKey(0), (B, Q, h, w, C))
    key = jax.random.PRNGKey(1)
    out = fifo.shift_queue(latents, key, tail_mode="plain")
    np.testing.assert_array_equal(
        np.asarray(out[:, :-1]), np.asarray(latents[:, 1:]))
    expect_tail = jax.random.normal(key, (B, 1, h, w, C), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(out[:, -1:]), np.asarray(expect_tail))
    # anchor has no effect in plain mode
    anchored = fifo.shift_queue(
        latents, key, anchor=latents[:, 3] * 5.0, tail_mode="plain")
    np.testing.assert_array_equal(np.asarray(anchored), np.asarray(out))
    with pytest.raises(ValueError):
        fifo.shift_queue(latents, key, tail_mode="bogus")


def test_advance_prompt_index():
    """Scene switch timing (funcs.py:425-431): prompt j becomes active once
    i - (S - f) reaches cum_lengths[j]; clamps at the last prompt."""
    import numpy as np
    cum = np.array([3, 5])  # scene0: 3 frames, scene1: 2 frames
    S, f = 8, 4  # warmup S - f = 4 iterations
    j = 0
    seen = []
    for i in range(5 + S - f):
        j = fifo.advance_prompt_index(i, S, f, cum, j)
        seen.append(j)
    # warmup (i<4): i-4 < 0 < 3 → scene 0; switches at i-4 == 3 → i == 7
    assert seen[:7] == [0] * 7
    assert seen[7:] == [1, 1]
    # clamped at the end even if i keeps growing
    assert fifo.advance_prompt_index(100, S, f, cum, 1) == 1


@pytest.mark.parametrize("seed", range(6))
def test_advance_prompt_index_reference_loop_fuzz(seed):
    """Fuzz the scene-switch schedule against a verbatim simulation of the
    reference's multiprompt loop (funcs.py:425-429: `if i - (S - f) >=
    prompt_lengths[j]: j += 1`, one check per iteration) across random
    (f, n) geometries and scene-length vectors — including zero-length
    scenes, which the reference skips one-per-iteration rather than all at
    once. Within the canonical `cum[-1] + S - f` iteration count the
    reference never indexes past the end, so ours must match exactly;
    beyond it (inconsistent lengths) ours clamps (the documented
    divergence)."""
    rng = np.random.default_rng(seed)
    f = int(rng.choice([2, 4, 8, 16]))
    n = int(rng.choice([2, 3, 4]))
    S = f * n
    k = int(rng.integers(1, 6))
    lengths = rng.integers(0, 15, size=k)
    lengths[-1] = max(1, lengths[-1])  # a real final scene
    cum = np.cumsum(lengths)
    total = int(cum[-1]) + S - f
    j_ref, j_ours = 0, 0
    for i in range(total):
        if i - (S - f) >= cum[j_ref]:
            j_ref += 1  # the reference's unguarded advance
        j_ours = fifo.advance_prompt_index(i, S, f, cum, j_ours)
        assert j_ref < len(cum), "canonical loop must not overrun"
        assert j_ours == j_ref, (i, f, n, lengths)
    # past the canonical loop the reference would overrun; we clamp
    assert fifo.advance_prompt_index(total + f, S, f, cum, j_ours) \
        == len(cum) - 1


@pytest.mark.parametrize("f,n,lookahead", [(4, 2, True), (4, 2, False),
                                           (16, 4, True), (8, 3, False)])
def test_mask_queue_shift_closed_form(f, n, lookahead):
    """DAVIS mask-queue evolution: the initial queue maps source masks via
    queue_frame_indices and every shift appends the LAST source mask
    (funcs.py:115-116 — the reference's tail write `masks[:,:,-1] =
    davis_data[1][:,:,-1]` aliases the just-shifted queue, so the tail
    stays pinned at masks[T0-1] forever). Closed form after k shifts:
    slot q holds masks[frame_idx[q+k]], with frame_idx extended by T0-1
    past the queue end."""
    s = schedule.make_schedule(ddim_num_steps=f * n, ddim_eta=1.0)
    plan = fifo.make_fifo_plan(np.asarray(s.ddim_timesteps), f, n, lookahead)
    rng = np.random.default_rng(f + n)
    for t0 in (1, f, f * n):
        masks = (rng.uniform(size=(t0, 3, 5)) > 0.5).astype(np.float32)
        frame_idx, _ = fifo.queue_frame_indices(plan, t0)
        q = jnp.asarray(masks[frame_idx][None, ..., None])
        tail = jnp.asarray(masks[-1][None, ..., None])
        ext = np.concatenate(
            [frame_idx, np.full(10, t0 - 1, np.int64)])
        for k in range(1, 8):
            q = fifo.shift_masks(q, tail)
            want = masks[ext[k : k + plan.queue_length]][None, ..., None]
            np.testing.assert_array_equal(np.asarray(q), want)
