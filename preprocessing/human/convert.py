#!/usr/bin/env python
"""Human3.6M preprocessing: mp4 videos -> per-video npz archives.

CLI/behavior parity with /root/reference/preprocessing/human/convert.py:
train subjects [1,5,6,7,8], test [9,11]; `_ALL`-prefixed videos skipped;
each frame cropped to (100,100,900,900) then LANCZOS-resized (sequentially,
per the protocol of "Unsupervised learning of object structure and dynamics
from videos", NeurIPS 2019); saved as npz with image/filename/subject.
"""

import argparse
import os

import numpy as np
from PIL import Image

TRAIN_SUBJECTS = [1, 5, 6, 7, 8]
TEST_SUBJECTS = [9, 11]


def generate_from_mp4(data_dir, image_size, train=True):
    import imageio
    save_dir = os.path.join(data_dir, "train" if train else "test")
    os.makedirs(save_dir, exist_ok=True)
    subjects = TRAIN_SUBJECTS if train else TEST_SUBJECTS
    for subject_id in subjects:
        subject_dir = os.path.join(data_dir, f"S{subject_id}", "Videos")
        for video_file in sorted(os.listdir(subject_dir)):
            if video_file[0] == "_":
                # `_ALL` videos are excluded by the dataset protocol
                continue
            video = imageio.get_reader(
                os.path.join(subject_dir, video_file), "ffmpeg")
            video_np = np.stack([
                np.array(Image.fromarray(frame).crop((100, 100, 900, 900))
                         .resize((image_size, image_size), resample=Image.LANCZOS))
                for frame in video.iter_data()
            ])
            name = os.path.splitext(video_file)[0]
            np.savez(os.path.join(save_dir, f"S{subject_id}-{name}"),
                     image=video_np, filename=name, subject=subject_id)
            print(f"S{subject_id}-{name}: {video_np.shape}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="Human3.6M preprocessing.",
        description="Generates training and testing videos for the Human3.6M "
                    "dataset as npz files in `train` and `test` folders.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where videos from the original dataset are stored.")
    p.add_argument("--image_size", type=int, metavar="SIZE", default=64,
                   help="Width and height of resulting processed videos.")
    args = p.parse_args()
    print("Train sequences...")
    generate_from_mp4(args.data_dir, args.image_size, train=True)
    print(os.linesep)
    print("Test sequences...")
    generate_from_mp4(args.data_dir, args.image_size, train=False)
