#!/usr/bin/env python
"""KTH preprocessing: dumps 64x64 PNG frames from the original .avi videos.

CLI/output parity with /root/reference/preprocessing/kth/convert.py: frames
are written to {data_dir}/processed_{SIZE}/{action}/{video}/image-%03d.png at
the requested frame rate via ffmpeg.
"""

import argparse
import os
import subprocess

CLASSES = ["boxing", "handclapping", "handwaving", "jogging", "running", "walking"]


def main(args):
    if not os.path.isdir(args.data_dir):
        raise SystemExit(f"Error with data directory: {args.data_dir}")
    for c in CLASSES:
        print(" ---- ")
        print(c)
        c_path = os.path.join(args.data_dir, "raw", c)
        for vid in sorted(os.listdir(c_path)):
            if os.path.splitext(vid)[1] != ".avi":
                continue
            fname = vid[:-11]  # strip "_uncomp.avi"
            print(fname)
            out_dir = os.path.join(args.data_dir, f"processed_{args.image_size}",
                                   c, fname)
            os.makedirs(out_dir)
            subprocess.call([
                "ffmpeg", "-i", os.path.join(c_path, vid),
                "-r", str(args.frame_rate), "-f", "image2",
                "-s", f"{args.image_size}x{args.image_size}",
                os.path.join(out_dir, "image-%03d.png"),
            ])


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="KTH preprocessing.",
        description="Generates training and testing videos for the KTH dataset "
                    "from the original videos into processed_${SIZE}.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where videos from the original dataset are stored.")
    p.add_argument("--image_size", type=int, metavar="SIZE", default=64,
                   help="Width and height of resulting processed videos.")
    p.add_argument("--frame_rate", type=int, metavar="RATE", default=25,
                   help="Frame rate at which videos are processed.")
    main(p.parse_args())
