"""Packs a BAIR PNG frame tree into per-video raw .npy files.

The reference stores BAIR as 30 PNG files per video
(/root/reference/preprocessing/bair/convert.py:55-81, data/bair.py:76-84),
which makes every training batch pay a PNG inflate for 192 x seq_len
frames. On hosts with few cores that decode dominates the input pipeline
(measured: natural-entropy 64x64 RGB PNGs decode at ~4.6k frames/s/core
native, 0.66x the v5e step rate). Packing each video into one raw uint8
(30, 64, 64, 3) .npy turns loading into a memory-mapped copy — no decode
at all — the same design the reference itself uses for Human3.6M
(npz-per-video, /root/reference/preprocessing/human/convert.py:85-88).

    python preprocessing/bair/pack.py --data_dir $DIR [--delete_png]

Reads  $DIR/processed_data/{train,test}/<traj>/<vid>/*.png
Writes $DIR/packed_data/{train,test}/<traj>/<vid>.npy
(the nested layout mirrors the PNG tree so video enumeration order — and
therefore the seed-42 train/val fold split — is identical in both formats)

srvp_tpu.data.bair.BAIR auto-detects packed_data/ and prefers it; pixels
are bit-identical (PNG is lossless).
"""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def pack_fold(data_dir, fold, delete_png=False):
    from PIL import Image
    src = join(data_dir, "processed_data", fold)
    dst = join(data_dir, "packed_data", fold)
    if not os.path.isdir(src):
        return 0
    os.makedirs(dst, exist_ok=True)
    n = 0
    for d1 in sorted(os.listdir(src)):
        for d2 in sorted(os.listdir(join(src, d1))):
            vdir = join(src, d1, d2)
            frames = sorted(f for f in os.listdir(vdir)
                            if os.path.splitext(f)[1] == ".png")
            if not frames:
                # A frameless video dir would make the packed tree enumerate
                # differently from the PNG tree (different seed-42 fold
                # split) — refuse to pack a corrupt source.
                raise ValueError(f"no PNG frames in {vdir}; source tree is "
                                 "incomplete, refusing to pack")
            video = np.stack([np.array(Image.open(join(vdir, f)))
                              for f in frames]).astype(np.uint8)
            os.makedirs(join(dst, d1), exist_ok=True)
            out = join(dst, d1, f"{d2}.npy")
            # tmp name must NOT end in .npy (make_dataset would enumerate a
            # crash leftover as a video); np.save appends .npy to bare
            # names, so write through an open file object.
            with open(out + ".tmp", "wb") as f:
                np.save(f, video)
            os.replace(out + ".tmp", out)
            if delete_png:
                for f in frames:
                    os.remove(join(vdir, f))
            n += 1
            if n % 200 == 0:
                print(f"  {fold}: {n} videos packed", flush=True)
    if n:
        write_marker(dst, n)
    return n


def write_marker(dst, n):
    """Completion marker: srvp_tpu.data only trusts a packed tree that has
    one and whose video count matches (an interrupted pack run must never
    silently shrink the dataset or shift the fold split)."""
    import json
    tmp = join(dst, "COMPLETE.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"videos": n}, f)
    os.replace(tmp, join(dst, "COMPLETE.json"))


def main():
    p = argparse.ArgumentParser(
        description="Pack BAIR PNG frames into per-video raw .npy files.")
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder with processed_data/{train,test} PNG trees.")
    p.add_argument("--delete_png", action="store_true",
                   help="Remove the source PNGs after packing each video.")
    args = p.parse_args()
    for fold in ("train", "test"):
        n = pack_fold(args.data_dir, fold, args.delete_png)
        print(f"{fold}: packed {n} videos into "
              f"{join(args.data_dir, 'packed_data', fold)}", flush=True)


if __name__ == "__main__":
    main()
