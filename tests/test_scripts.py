"""Utility-script coverage (ref: analyze_results.py, utils/v2i.py,
convert_gifs.py) — exercised as importable functions / subprocesses on
synthetic inputs."""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_analyze_results_weighted_averages(tmp_path):
    """Weighted per-dimension averages on the 1-5 scale
    (ref analyze_results.py:22-65 semantics)."""
    ar = _load("analyze_results")
    csv_path = tmp_path / "responses.csv"
    csv_path.write_text(
        "Timestamp,Blending quality [MoCA],Video Consistency [MoCA],"
        "Character consistency [MoCA],Overall quality [MoCA]\n"
        "t1,5,4,4 - good,3\n"
        "t2,3,4,5,5\n"
        "t3,4 stars,2,3,4\n")
    out = ar.analyze(str(csv_path))
    assert out["BQ"] == 4.0       # (5+3+4)/3
    assert out["VC"] == round(10 / 3, 3)
    assert out["CC"] == 4.0       # (4+5+3)/3
    assert out["OQ"] == 4.0


def test_analyze_results_ignores_out_of_range_and_unclassified(tmp_path):
    ar = _load("analyze_results")
    csv_path = tmp_path / "r.csv"
    csv_path.write_text(
        "Timestamp,Blending [A],Unrelated column\n"
        "t,7,5\n"      # 7 out of 1-5 range → dropped; unrelated → dropped
        "t,2,1\n")
    out = ar.analyze(str(csv_path))
    assert out == {"BQ": 2.0}


def test_convert_gifs_roundtrip(tmp_path):
    import imageio

    from moca_tpu.io.video import load_video_frames

    cg = _load("convert_gifs")
    gif = tmp_path / "clip.gif"
    frames = [np.full((32, 48, 3), 40 * i, np.uint8) for i in range(5)]
    imageio.mimsave(str(gif), frames, duration=100)
    out = cg.convert(str(gif), fps=10)
    assert out.endswith(".mp4") and os.path.exists(out)
    back = load_video_frames(out)
    assert back.shape[0] == 5 and back.shape[1:] == (32, 48, 3)


def test_v2i_extracts_frames(tmp_path):
    from moca_tpu.io.video import save_video

    mp4 = tmp_path / "v.mp4"
    frames = [np.full((32, 48, 3), 30 * i, np.uint8) for i in range(6)]
    save_video(frames, str(mp4), fps=10)
    outdir = tmp_path / "frames"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "v2i.py"), str(mp4),
         "--outdir", str(outdir), "--stride", "2"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0, r.stderr[-500:]
    pngs = sorted(os.listdir(outdir))
    assert pngs == ["00000.png", "00001.png", "00002.png"]
