"""Batch gif→mp4 conversion (ref: convert_gifs.py — ffmpeg subprocess loop).

This image has no ffmpeg binary; conversion goes through imageio (gif read)
+ cv2.VideoWriter (mp4 write), reusing the framework IO layer.
"""

from __future__ import annotations

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import imageio
import numpy as np

from moca_tpu.io.video import save_video


def convert(gif_path: str, fps: int = 10) -> str:
    frames = [np.asarray(f)[..., :3] for f in imageio.mimread(gif_path)]
    out = os.path.splitext(gif_path)[0] + ".mp4"
    save_video([f.astype(np.uint8) for f in frames], out, fps=fps)
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("root", help="directory tree to scan for .gif")
    p.add_argument("--fps", type=int, default=10)
    args = p.parse_args()
    for gif in glob.glob(os.path.join(args.root, "**", "*.gif"),
                         recursive=True):
        print(convert(gif, args.fps))
