"""Build + exercise the native fastio extension (native/fastio.cpp) through
its ctypes bindings, asserting bit-parity with the numpy fallbacks in
io/video.py (ref host path: funcs.py:565, 630-640)."""

from __future__ import annotations

import os
import subprocess

import numpy as np
import pytest

NATIVE = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


@pytest.fixture(scope="module")
def fastio():
    if not os.path.exists(os.path.join(NATIVE, "libfastio.so")):
        r = subprocess.run(["make", "-C", NATIVE], capture_output=True,
                           text=True)
        if r.returncode != 0:
            pytest.skip(f"native build failed: {r.stderr[-500:]}")
    from moca_tpu.io import fastio as mod

    if not mod.available():
        pytest.skip("libfastio.so not loadable")
    return mod


def test_float_to_uint8_matches_numpy(fastio):
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.5, 1.5, size=(7, 33, 3)).astype(np.float32)
    expect = ((np.clip(x, -1, 1) + 1.0) * 127.5).astype(np.uint8)
    got = fastio.float_to_uint8(x)
    # the native clamp truncates identically; allow ±1 only at exact .5
    # boundaries — in practice both truncate, so require exact equality
    np.testing.assert_array_equal(got, expect)


def test_uint8_to_float_matches_numpy(fastio):
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    expect = (x.astype(np.float32) / 255.0 - 0.5) * 2.0
    np.testing.assert_allclose(fastio.uint8_to_float(x), expect, atol=1e-6)


def test_roundtrip_large_parallel_path(fastio):
    # > 1<<16 elements triggers the multithreaded chunking
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(320, 512, 3), dtype=np.uint8)
    f = fastio.uint8_to_float(img)
    back = fastio.float_to_uint8(f)
    assert np.abs(back.astype(np.int32) - img.astype(np.int32)).max() <= 1


def test_pack_frames_matches_stack(fastio):
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, size=(40, 64, 3), dtype=np.uint8)
              for _ in range(9)]
    np.testing.assert_array_equal(fastio.pack_frames(frames),
                                  np.stack(frames))


def test_pack_frames_shape_mismatch(fastio):
    with pytest.raises(ValueError):
        fastio.pack_frames([np.zeros((2, 2), np.uint8),
                            np.zeros((3, 2), np.uint8)])


def test_stack_frames_uses_native(fastio):
    from moca_tpu.io import video

    frames = [np.full((4, 4, 3), i, np.uint8) for i in range(5)]
    np.testing.assert_array_equal(video.stack_frames(frames),
                                  np.stack(frames))
    # float frames fall back to np.stack
    ff = [np.zeros((4, 4, 3), np.float32) for _ in range(3)]
    assert video.stack_frames(ff).shape == (3, 4, 4, 3)
