#!/usr/bin/env python
"""Reproducible synthetic Human3.6M-format dataset (per-video npz, stride-8).

No real Human3.6M videos are reachable from a zero-egress environment, so
training-stack demonstrations of the Human3.6M recipe (3-channel frames,
whole-video npz files held in RAM, temporal subsampling with stride 8 —
/root/reference/data/human.py:60-65,91-110) use this generator: it writes
the exact on-disk layout `preprocessing/human/convert.py` produces —
`$DIR/{train,test}/<Sx_Action_i>.npz` with `image`/`filename`/`subject`
keys — so the real Human dataset class and `preprocessing/human/
make_test_set.py` both operate on it unchanged.

Content mirrors the dataset's structure (static camera, static scene, one
moving subject): a per-video color-gradient background (the content signal
for w/skips) + ONE procedural glyph bouncing with the reference MMNIST
physics at max_speed=1, tinted a random saturated color. With the stride-8
subsampling, apparent motion is <=8 px per *subsampled* frame.

Train videos use subjects S1/S5/S6/S7/S8 and test videos S9/S11, matching
/root/reference/preprocessing/human/convert.py:27-28.

    python scripts/make_synthetic_human.py --out $DIR \
        [--n_train 48] [--n_test 16] [--train_len 600] [--test_len 424] \
        [--seed 0]
"""

import argparse
import os

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits  # noqa: E402
from scripts.make_synthetic_bair import _background, _saturated_color  # noqa: E402

TRAIN_SUBJECTS = [1, 5, 6, 7, 8]   # reference convert.py:27
TEST_SUBJECTS = [9, 11]            # reference convert.py:28


def render_video(gen, rng, nx, seq_len):
    """(seq_len, nx, nx, 3) uint8: gradient background + 1 tinted glyph."""
    bg = _background(rng, nx)
    acc = np.broadcast_to(bg, (seq_len, nx, nx, 3)).copy()
    g = gen.get_item(rng.randint(len(gen.data)), rng)   # (T, nx, nx) u8
    tint = _saturated_color(rng)
    acc += g[..., None].astype(np.float32) / 255.0 * tint
    return (np.clip(acc, 0.0, 1.0) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=48)
    p.add_argument("--n_test", type=int, default=16)
    p.add_argument("--train_len", type=int, default=600,
                   help="frames per training video (>= (seq_len-1)*8+1)")
    p.add_argument("--test_len", type=int, default=424,
                   help="frames per test video (>= (53-1)*8+1 = 417)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nx", type=int, default=64)
    a = p.parse_args()

    rng = np.random.RandomState(a.seed)
    for fold, n_vids, seq_len, subjects in [
            ("train", a.n_train, a.train_len, TRAIN_SUBJECTS),
            ("test", a.n_test, a.test_len, TEST_SUBJECTS)]:
        d = os.path.join(a.out, fold)
        os.makedirs(d, exist_ok=True)
        # single-glyph stream with the reference bounce physics; slow speed
        # because the loader subsamples with stride 8
        gen = MovingMNIST(synthetic_digits(40, rng), a.nx, seq_len,
                          max_speed=1, deterministic=False, num_digits=1,
                          train=True)
        for v in range(n_vids):
            subject = subjects[v % len(subjects)]
            name = f"S{subject}_Act_{v}"
            vid = render_video(gen, rng, a.nx, seq_len)
            np.savez_compressed(os.path.join(d, name + ".npz"),
                                image=vid, filename=name, subject=subject)
        print(f"{fold}: {n_vids} videos x {seq_len} frames under {d}")


if __name__ == "__main__":
    main()
