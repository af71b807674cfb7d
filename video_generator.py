"""Batch PNG->mp4 conversion CLI (parity: /root/reference/video_generator.py).

Usage:
  python video_generator.py --img_dir logs/x/train_render/step_200000 [--fps 30]
"""

import argparse

from intrinsicnerf_tpu.tools.video import generate_all


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--img_dir", required=True)
    parser.add_argument("--out_dir", default=None)
    parser.add_argument("--fps", type=int, default=30)
    args = parser.parse_args()
    written = generate_all(args.img_dir, args.out_dir, args.fps)
    for w in written:
        print("wrote", w)
    if not written:
        print("no recognized frame sequences found")


if __name__ == "__main__":
    main()
