#!/usr/bin/env python
"""Generates the Human3.6M testing set from processed test videos.

CLI/behavior parity with /root/reference/preprocessing/human/make_test_set.py:
seed-42 random clips of (seq_len-1)*subsampling + 1 original frames
(intermediate frames kept for loader compatibility), saved per-clip as
test_{i}.npz in test_set_{seq_len}_{subsampling}/.
"""

import argparse
import os

import numpy as np


def main(args):
    np.random.seed(args.seed)
    save_dir = os.path.join(args.data_dir,
                            f"test_set_{args.seq_len}_{args.subsampling}")
    os.makedirs(save_dir, exist_ok=True)
    print(f"Generating test set at {save_dir}...")
    video_files = sorted(os.listdir(os.path.join(args.data_dir, "test")))
    actual_seq_len = (args.seq_len - 1) * args.subsampling + 1
    for i in range(args.size):
        video_id = np.random.randint(len(video_files))
        path = os.path.join(args.data_dir, "test", video_files[video_id])
        video_data = {k: v for k, v in np.load(path).items()}
        t_0 = np.random.randint(video_data["image"].shape[0] - actual_seq_len + 1)
        video_data["image"] = video_data["image"][t_0: t_0 + actual_seq_len]
        video_data["frame"] = t_0
        np.savez(os.path.join(save_dir, f"test_{i}"), **video_data)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{args.size}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="Human3.6M testing set generation.",
        description="Generates the Human3.6M testing set from the testing "
                    "videos by extracting fixed-length sequences.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where the dataset is stored and the testing set "
                        "will be saved.")
    p.add_argument("--size", type=int, metavar="SIZE", default=1000,
                   help="Number of sequences to extract.")
    p.add_argument("--seq_len", type=int, metavar="LEN", default=53,
                   help="Number of frames per sequence to extract.")
    p.add_argument("--subsampling", type=int, metavar="SUB", default=8,
                   help="Selects one in $SUB frames.")
    p.add_argument("--seed", type=int, metavar="SEED", default=42,
                   help="Fixed NumPy seed to produce the same dataset each run.")
    main(p.parse_args())
