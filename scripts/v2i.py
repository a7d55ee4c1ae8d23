"""Video → frame images (ref: utils/v2i.py — same flag surface and
frame_{N:06d}.{format} output naming; cv2 decode via the framework IO
layer)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from PIL import Image

from moca_tpu.io.video import load_video_frames, tensor_to_uint8

if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Convert video to images")
    p.add_argument("--video_path", required=True,
                   help="Path to the input video file")
    p.add_argument("--output_dir", default="output_frames",
                   help="Directory to save extracted frames")
    p.add_argument("--frame_rate", type=int, default=1,
                   help="Extract one frame every N frames (default: 1)")
    p.add_argument("--image_format", default="jpg",
                   help="Output image format (default: jpg)")
    args = p.parse_args()
    os.makedirs(args.output_dir, exist_ok=True)
    frames = load_video_frames(args.video_path, stride=args.frame_rate)
    for i, f in enumerate(frames):
        Image.fromarray(tensor_to_uint8(f)).save(os.path.join(
            args.output_dir, f"frame_{i:06d}.{args.image_format}"))
    print(f"Saved {len(frames)} frames to {args.output_dir}")
