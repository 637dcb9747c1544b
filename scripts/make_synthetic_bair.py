#!/usr/bin/env python
"""Reproducible synthetic BAIR-format dataset (3-channel, 30-frame videos).

No real BAIR TFRecords are reachable from a zero-egress environment, so
training-stack demonstrations of the BAIR recipe (3-channel frames, the
30-frame fixed-length format of /root/reference/data/bair.py, random-start
training windows) use this generator: it writes the exact on-disk layout
`preprocessing/bair/convert.py` produces — `processed_data/{train,test}/
traj_<i>/<j>/<t:02d>.png` — so the real BAIR dataset class, the native PNG
decoder, and `preprocessing/bair/pack.py` all operate on it unchanged.

Content is structured, not noise (a model must be able to learn it):
each video = a static per-video color-gradient background (the content
signal for w/skips) + two procedural glyphs (scripts share the
synthetic-glyph generator with the MMNIST fallback) bouncing with the
reference MMNIST physics, each tinted a random saturated color.

    python scripts/make_synthetic_bair.py --out $DIR \
        [--n_train 512] [--n_test 32] [--seed 0]
"""

import argparse
import os

import numpy as np

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits  # noqa: E402


def _saturated_color(rng):
    """A random bright, saturated RGB triple in [0, 1]."""
    c = rng.rand(3)
    c = (c - c.min()) / max(c.max() - c.min(), 1e-6)   # full saturation
    return 0.25 + 0.75 * c                              # keep it bright


def _background(rng, nx):
    """Static smooth per-video gradient: the content signal."""
    gy, gx = np.mgrid[0:nx, 0:nx].astype(np.float32) / (nx - 1)
    c0 = rng.rand(3).astype(np.float32) * 0.35
    c1 = rng.rand(3).astype(np.float32) * 0.35
    ang = rng.rand() * 2 * np.pi
    t = (np.cos(ang) * gx + np.sin(ang) * gy + 1) / 2
    return c0 + t[..., None] * (c1 - c0)               # (nx, nx, 3)


def render_video(gen, rng, nx=64, seq_len=30):
    """(seq_len, nx, nx, 3) uint8: gradient background + 2 tinted glyphs."""
    bg = _background(rng, nx)
    acc = np.broadcast_to(bg, (seq_len, nx, nx, 3)).copy()
    for _ in range(2):
        g = gen.get_item(rng.randint(len(gen.data)), rng)  # (T, nx, nx) u8
        tint = _saturated_color(rng)
        acc += g[..., None].astype(np.float32) / 255.0 * tint
    return (np.clip(acc, 0.0, 1.0) * 255).astype(np.uint8)


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--out", required=True)
    p.add_argument("--n_train", type=int, default=512)
    p.add_argument("--n_test", type=int, default=32)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--nx", type=int, default=64)
    p.add_argument("--seq_len", type=int, default=30,
                   help="BAIR videos are exactly 30 frames")
    a = p.parse_args()

    from PIL import Image
    rng = np.random.RandomState(a.seed)
    # single-glyph MMNIST stream with the reference bounce physics
    gen = MovingMNIST(synthetic_digits(40, rng), a.nx, a.seq_len,
                      max_speed=4, deterministic=False, num_digits=1,
                      train=True)

    for fold, n_vids in [("train", a.n_train), ("test", a.n_test)]:
        for v in range(n_vids):
            vid = render_video(gen, rng, a.nx, a.seq_len)
            d = os.path.join(a.out, "processed_data", fold,
                             f"traj_{v // 16}", str(v % 16))
            os.makedirs(d, exist_ok=True)
            for t in range(a.seq_len):
                Image.fromarray(vid[t]).save(
                    os.path.join(d, f"{t:02d}.png"))
        print(f"{fold}: {n_vids} videos x {a.seq_len} frames under "
              f"{a.out}/processed_data/{fold}")


if __name__ == "__main__":
    main()
