#!/usr/bin/env python
"""Generates a held-out SYNTHETIC-glyph Moving MNIST test set npz.

The real protocol test set comes from preprocessing/mmnist/make_test_set.py
(MNIST IDX digits, reference draw order — bit-exact golden-tested). In this
zero-egress environment there is no MNIST, so long-run evaluations
(docs/TRAINING_RUN.md) use procedural glyphs: same physics, same npz layout
(`sequences` uint8, time-major (T, N, H, W) — the format test.py consumes,
/root/reference/test.py:150-160), but digits drawn by
srvp_tpu.data.mmnist.synthetic_digits. Use a digit_seed DIFFERENT from the
training fallback's (0 is what --allow_synthetic trains on; default here is
1) so the test set is held out at the glyph level, not just the trajectory
level.

    python scripts/make_synthetic_test_set.py --data_dir DIR \
        [--n_videos 128] [--seq_len 30] [--digit_seed 1] [--traj_seed 77777]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits  # noqa: E402


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--data_dir", required=True,
                   help="Output dir; writes {smmnist|mmnist}_test_"
                        "{ndigits}digits_{nx}.npz")
    p.add_argument("--n_videos", type=int, default=128)
    p.add_argument("--seq_len", type=int, default=30)
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--ndigits", type=int, default=2)
    p.add_argument("--max_speed", type=int, default=4)
    p.add_argument("--deterministic", action="store_true")
    p.add_argument("--digit_seed", type=int, default=1,
                   help="Glyph-bank seed (train fallback uses 0 — keep "
                        "them different for a held-out set)")
    p.add_argument("--traj_seed", type=int, default=77777)
    p.add_argument("--n_glyphs", type=int, default=1000)
    args = p.parse_args()

    digits = synthetic_digits(args.n_glyphs,
                              np.random.RandomState(args.digit_seed))
    gen = MovingMNIST(digits, args.nx, args.seq_len, args.max_speed,
                      args.deterministic, args.ndigits, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(args.traj_seed + i))
                     for i in range(args.n_videos)])       # (N, T, H, W)
    name = ("mmnist" if args.deterministic else "smmnist")
    out = os.path.join(args.data_dir,
                       f"{name}_test_{args.ndigits}digits_{args.nx}.npz")
    os.makedirs(args.data_dir, exist_ok=True)
    np.savez_compressed(out, sequences=np.transpose(vids, (1, 0, 2, 3)))
    print(f"wrote {out}: sequences {(args.seq_len, args.n_videos, args.nx, args.nx)} uint8")


if __name__ == "__main__":
    main()
