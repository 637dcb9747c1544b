#!/usr/bin/env python
"""Generates the KTH testing set npz from processed frames.

CLI/behavior parity with /root/reference/preprocessing/kth/make_test_set.py:
seed-42 random draws over persons 21-25 / actions / trials 1-4 with random
temporal crops; saves sequences/persons/actions to svg_test_set_{len}.npz.
"""

import argparse
import os
from os.path import join

import numpy as np
from PIL import Image

CLASSES = ["boxing", "handclapping", "handwaving", "jogging", "running", "walking"]


def main(args):
    np.random.seed(args.seed)
    processed_dir = join(args.data_dir, f"processed_{args.image_size}")
    sequences, persons, actions = [], [], []
    for i in range(args.size):
        action = CLASSES[np.random.randint(len(CLASSES))]
        person = np.random.randint(21, 26)
        trial = np.random.randint(1, 5)
        vid = f"person{person:02d}_{action}_d{trial}"
        frames = sorted(os.listdir(join(processed_dir, action, vid)))
        t_0 = np.random.randint(len(frames) - args.seq_len + 1)
        images = [
            np.array(Image.open(join(processed_dir, action, vid,
                                     frames[t_0 + t])))[:, :, 0]
            for t in range(args.seq_len)
        ]
        sequences.append(np.array(images))
        persons.append(person)
        actions.append(action)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{args.size}")
    save_file = join(args.data_dir, f"svg_test_set_{args.seq_len}.npz")
    print(f"Saving testset at {save_file}")
    np.savez_compressed(save_file, sequences=np.array(sequences),
                        persons=persons, actions=actions)


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="KTH testing set generation.",
        description="Generates the KTH testing set from the testing videos by "
                    "extracting fixed-length sequences into an npz file.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where the dataset is stored and the testing set "
                        "will be saved.")
    p.add_argument("--size", type=int, metavar="SIZE", default=1000,
                   help="Number of sequences to extract.")
    p.add_argument("--seq_len", type=int, metavar="LEN", default=40,
                   help="Number of frames per testing sequence.")
    p.add_argument("--image_size", type=int, metavar="SIZE", default=64,
                   help="Width and height of videos.")
    p.add_argument("--seed", type=int, metavar="SEED", default=42,
                   help="Fixed NumPy seed to produce the same dataset each run.")
    main(p.parse_args())
