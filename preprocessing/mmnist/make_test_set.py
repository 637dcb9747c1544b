#!/usr/bin/env python
"""Generates the Moving MNIST testing set (videos + latents) as an npz.

CLI parity with /root/reference/preprocessing/mmnist/make_test_set.py:
same flags, same draw order (seeded digit permutation, per-digit trajectory
sampling through the dataset's own physics), same npz fields (sequences,
latents, labels, digits) and file naming. Reads MNIST test digits from IDX
files natively (no torchvision).
"""

import argparse
import os
from os.path import join

import numpy as np

from srvp_tpu.data.mmnist import MovingMNIST, load_mnist_images, load_mnist_labels


def main(args):
    np.random.seed(args.seed)
    rng = np.random  # module-level RNG, seeded above (reference draw order)

    images = load_mnist_images(args.data_dir, train=False)
    labels = load_mnist_labels(args.data_dir, train=False)
    digits_idx = rng.permutation(len(images))
    sampler = MovingMNIST([], args.frame_size, args.seq_len, args.max_speed,
                          args.deterministic, args.digits, True)

    test_videos, test_latents, test_labels, test_objects = [], [], [], []
    n_seqs = len(images) // args.digits
    for i in range(n_seqs):
        x = np.zeros((args.seq_len, args.frame_size, args.frame_size), np.float32)
        latents, labs, objs = [], [], []
        for n in range(args.digits):
            idx = digits_idx[i * args.digits + n]
            img = np.asarray(images[idx], dtype=np.uint8)
            trajectory = sampler._compute_trajectory(rng, *img.shape)
            latents.append(np.array(trajectory))
            labs.append(labels[idx])
            objs.append(img)
            for t in range(args.seq_len):
                sx, sy, _, _ = trajectory[t]
                x[t, sx:sx + img.shape[0], sy:sy + img.shape[1]] += img
        x[x > 255] = 255
        test_videos.append(x.astype(np.uint8))
        test_latents.append(np.array(latents))
        test_labels.append(np.array(labs).astype(np.uint8))
        test_objects.append(np.array(objs))
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{n_seqs}")

    test_videos = np.array(test_videos, dtype=np.uint8).transpose(1, 0, 2, 3)
    test_latents = np.array(test_latents).transpose(2, 0, 1, 3)
    test_labels = np.array(test_labels, dtype=np.uint8)
    test_objects = np.array(test_objects)

    fname = f"mmnist_test_{args.digits}digits_{args.frame_size}.npz"
    if not args.deterministic:
        fname = f"s{fname}"
    os.makedirs(args.data_dir, exist_ok=True)
    print(f"Saving testset at {join(args.data_dir, fname)}")
    np.savez_compressed(join(args.data_dir, fname), sequences=test_videos,
                        latents=test_latents, labels=test_labels,
                        digits=test_objects)


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="Moving MNIST testing set generation.",
        description="Generates the Moving MNIST testing set. Videos and latent "
                    "space (position, speed) are saved in an npz file.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where the testing set will be saved.")
    p.add_argument("--seq_len", type=int, metavar="LEN", default=100,
                   help="Number of frames per testing sequence.")
    p.add_argument("--seed", type=int, metavar="SEED", default=42,
                   help="Fixed NumPy seed to produce the same dataset each run.")
    p.add_argument("--deterministic", action="store_true",
                   help="Generate the deterministic variant of the dataset.")
    p.add_argument("--digits", type=int, metavar="NUM", default=2,
                   help="Number of digits per video.")
    p.add_argument("--frame_size", type=int, metavar="SIZE", default=64,
                   help="Size of generated frames.")
    p.add_argument("--max_speed", type=int, metavar="SPEED", default=4,
                   help="Maximum speed of generated trajectories.")
    main(p.parse_args())
