"""Video → frame images (ref: utils/v2i.py)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from PIL import Image

from moca_tpu.io.video import load_video_frames, tensor_to_uint8

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("video")
    p.add_argument("--outdir", default=None)
    p.add_argument("--stride", type=int, default=1)
    args = p.parse_args()
    outdir = args.outdir or os.path.splitext(args.video)[0] + "_frames"
    os.makedirs(outdir, exist_ok=True)
    frames = load_video_frames(args.video, stride=args.stride)
    for i, f in enumerate(frames):
        Image.fromarray(tensor_to_uint8(f)).save(
            os.path.join(outdir, f"{i:05d}.png"))
    print(f"wrote {len(frames)} frames to {outdir}")
