#!/usr/bin/env python
"""Input-pipeline benchmark: can the host loader feed the TPU step rate?

Builds a synthetic-but-realistic PNG frame tree (KTH-like grayscale,
BAIR-like RGB; smooth content so PNG sizes match natural video frames
rather than incompressible noise), then measures LOADER-ONLY throughput of
the real DataLoader at the production shapes:

    KTH : batch 100 x seq 20 (reference README KTH training recipe)
    BAIR: batch 192 x seq 30

and compares with the measured device step rate (BENCH json, frames/s/chip)
times a 1.2x headroom factor. Reference equivalent: 4 torch DataLoader
worker processes (/root/reference/train.py:261-266).

    python scripts/bench_loader.py [--root /tmp/srvp_loader_bench]
        [--device_rate_kth 6900] [--device_rate_bair 6900]

Prints one JSON line per config.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from srvp_tpu.data.kth import KTH  # noqa: E402
from srvp_tpu.data.bair import BAIR  # noqa: E402
from srvp_tpu.data.loader import DataLoader, infinite_batches  # noqa: E402


def _frame(i, t, rgb=False, noise_amp=0):
    """Synthetic frame: smooth moving gradient, plus optional sensor-style
    texture noise. noise_amp=0 compresses like clean rendered video
    (~1-2 KB/frame PNG); noise_amp~14 yields IDAT sizes matching natural
    camera video (BAIR robot-arm frames are ~6-8 KB at 64x64 RGB) — the
    decode-cost-realistic case for loader benchmarking."""
    y, x = np.mgrid[0:64, 0:64]
    img = ((np.sin(x / 9.0 + i * 0.7 + t * 0.13)
            + np.cos(y / 7.0 + t * 0.11)) * 55 + 120)
    if noise_amp:
        # Noise frames are deliberately gray-based (same luma in all three
        # RGB channels) + independent per-channel noise: the knob calibrates
        # PNG IDAT size to natural camera footage, which is what sets decode
        # cost — not the clean path's stylized distinct-channel content.
        rng = np.random.RandomState(i * 1000 + t)
        shape = (64, 64, 3) if rgb else (64, 64)
        noisy = img[..., None] if rgb else img
        return np.clip(noisy + rng.randint(-noise_amp, noise_amp + 1, shape),
                       0, 255).astype(np.uint8)
    img = img.astype(np.uint8)
    if not rgb:
        return img
    return np.stack([img, np.roll(img, t, 0), 255 - img], -1)


def build_kth_tree(root, n_videos=120, frames_per_video=120, noise_amp=0):
    from PIL import Image
    done = os.path.join(root, f".done_kth_n{noise_amp}")
    if os.path.exists(done):
        return
    print(f"building synthetic KTH tree under {root} "
          f"({n_videos} videos x {frames_per_video} frames, "
          f"noise_amp={noise_amp})...", flush=True)
    for i in range(n_videos):
        cls = KTH.classes[i % len(KTH.classes)]
        person = (i % 20) + 1  # persons 1-20 are the train split
        vdir = os.path.join(root, "processed_64", cls,
                            f"person{person:02d}_{cls}_d{i:04d}")
        os.makedirs(vdir, exist_ok=True)
        for t in range(frames_per_video):
            Image.fromarray(_frame(i, t, noise_amp=noise_amp)).save(
                os.path.join(vdir, f"{t:03d}.png"))
    open(done, "w").close()


def build_bair_tree(root, n_videos=256, noise_amp=0):
    from PIL import Image
    done = os.path.join(root, f".done_bair_n{noise_amp}")
    if os.path.exists(done):
        return
    print(f"building synthetic BAIR tree under {root} "
          f"({n_videos} videos x 30 frames, noise_amp={noise_amp})...",
          flush=True)
    for i in range(n_videos):
        vdir = os.path.join(root, "processed_data", "train",
                            f"traj_{i // 32}", f"{i % 32}")
        os.makedirs(vdir, exist_ok=True)
        for t in range(30):
            Image.fromarray(_frame(i, t, rgb=True, noise_amp=noise_amp)).save(
                os.path.join(vdir, f"{t:02d}.png"))
    open(done, "w").close()


def bench(dataset, batch, seq_len, n_batches, num_workers, native):
    if not native:
        # hide the native hook so the loader takes the PIL thread-pool path
        class NoNative:
            def __init__(self, ds):
                self._ds = ds

            def __len__(self):
                return len(self._ds)

            def get_item(self, index, rng):
                return self._ds.get_item(index, rng)

        dataset = NoNative(dataset)
    from srvp_tpu.data.base import collate_uint8
    loader = DataLoader(dataset, batch, shuffle=True, drop_last=True,
                        seed=0, num_workers=num_workers, prefetch=2,
                        collate_fn=collate_uint8)
    it = infinite_batches(loader)
    next(it)  # warmup (thread pool spin-up, page cache)
    t0 = time.perf_counter()
    n = 0
    for _ in range(n_batches):
        b = next(it)
        n += b.shape[0] * b.shape[1] if b.ndim >= 2 else len(b)
    dt = time.perf_counter() - t0
    return n / dt  # actual frames delivered (== batch*seq_len*n_batches with drop_last)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="/tmp/srvp_loader_bench")
    p.add_argument("--device_rate_kth", type=float, default=6900.0,
                   help="measured KTH train step rate, frames/s/chip")
    p.add_argument("--device_rate_bair", type=float, default=6900.0)
    p.add_argument("--n_batches", type=int, default=8)
    p.add_argument("--workers", type=int, default=4)
    p.add_argument("--noise_amp", type=int, default=0,
                   help="Per-pixel noise amplitude for the synthetic frames; "
                        "~14 matches natural camera video PNG sizes "
                        "(decode-realistic), 0 is clean rendered content.")
    args = p.parse_args()

    root = args.root if args.noise_amp == 0 else (
        f"{args.root.rstrip('/')}_n{args.noise_amp}")
    os.makedirs(root, exist_ok=True)
    args.root = root
    build_kth_tree(args.root, noise_amp=args.noise_amp)
    build_bair_tree(args.root, noise_amp=args.noise_amp)
    sizes = []
    for dirpath, _, files in os.walk(args.root):
        sizes += [os.path.getsize(os.path.join(dirpath, f))
                  for f in files if f.endswith(".png")]
        if len(sizes) > 2000:
            break
    if sizes:
        print(json.dumps({"png_bytes_per_frame_mean":
                          round(float(np.mean(sizes)), 1)}), flush=True)

    # packed trees: coalesce the PNG trees into per-video raw .npy once,
    # then measure the mmap fast paths next to the PNG-decode paths
    from preprocessing.bair.pack import pack_fold
    from preprocessing.kth.pack import pack_tree
    pack_fold(args.root, "train")
    pack_tree(args.root)

    kth_packed = KTH.make_dataset(args.root, 64, 20, True)
    bair_packed = BAIR.make_dataset(args.root, 30, True)
    assert kth_packed.packed and bair_packed.packed
    # the PNG legs: same datasets, packed detection bypassed
    kth_png = KTH.make_dataset(args.root, 64, 20, True, prefer_packed=False)
    bair_png = BAIR.make_dataset(args.root, 30, True, prefer_packed=False)
    assert not kth_png.packed and not bair_png.packed

    configs = [
        ("kth", kth_png, kth_packed, 100, 20, args.device_rate_kth),
        ("bair", bair_png, bair_packed, 192, 30, args.device_rate_bair),
    ]
    for name, png_ds, packed_ds, batch, seq_len, device_rate in configs:
        row = {"metric": f"loader_frames_per_sec_{name}",
               "unit": "frames/s", "batch": batch, "seq_len": seq_len,
               "device_rate": device_rate,
               "host_cpus": os.cpu_count()}
        for native in (False, True):
            fps = bench(png_ds, batch, seq_len, args.n_batches,
                        args.workers, native)
            row["value" if native else "pil_value"] = round(fps, 1)
        row["packed_value"] = round(
            bench(packed_ds, batch, seq_len, args.n_batches, args.workers,
                  native=True), 1)
        best = row["packed_value"]
        row["vs_device_rate"] = round(best / device_rate, 2)
        row["feeds_device_1.2x"] = best >= 1.2 * device_rate
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
