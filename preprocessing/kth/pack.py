"""Packs a KTH PNG frame tree into per-video raw .npy files.

Same rationale as preprocessing/bair/pack.py: the reference stores KTH as
one PNG per frame (/root/reference/preprocessing/kth/convert.py:44-52,
data/kth.py:134-151), so every random temporal crop pays a PNG inflate per
frame. Packing each video into one raw uint8 (T, nx, nx) .npy (grayscale —
the first channel, exactly what training consumes) turns window loading
into a memory-mapped copy with no decode.

    python preprocessing/kth/pack.py --data_dir $DIR [--nx 64] [--delete_png]

Reads  $DIR/processed_{nx}/<action>/<video>/*.png
Writes $DIR/packed_{nx}/<action>/<video>.npy

srvp_tpu.data.kth.KTH auto-detects packed_{nx}/ and prefers it;
pixels, video enumeration order, fold splits, and window draws are
identical to the PNG tree.
"""

import argparse
import os
import sys
from os.path import join

import numpy as np

sys.path.insert(0, os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def pack_tree(data_dir, nx=64, delete_png=False):
    from PIL import Image
    from srvp_tpu.data.kth import KTH
    src = join(data_dir, f"processed_{nx}")
    dst = join(data_dir, f"packed_{nx}")
    n = 0
    # Enumerate exactly the directory set KTH.make_dataset validates the
    # completion marker against (KTH.classes) — a stray non-class directory
    # under processed_{nx} must not inflate the marker count and
    # permanently disqualify the packed tree.
    for c in KTH.classes:
        cdir = join(src, c)
        if not os.path.isdir(cdir):
            continue
        os.makedirs(join(dst, c), exist_ok=True)
        for vid in sorted(os.listdir(cdir)):
            vdir = join(cdir, vid)
            if not os.path.isdir(vdir):
                continue
            frames = sorted(f for f in os.listdir(vdir)
                            if os.path.splitext(f)[1] == ".png")
            if not frames:
                # A frameless video dir would make the packed tree enumerate
                # differently from the PNG tree — refuse to pack a corrupt
                # source (see preprocessing/bair/pack.py).
                raise ValueError(f"no PNG frames in {vdir}; source tree is "
                                 "incomplete, refusing to pack")
            video = np.empty((len(frames), nx, nx), np.uint8)
            for t, f in enumerate(frames):
                frame = np.array(Image.open(join(vdir, f)))
                video[t] = frame[:, :, 0] if frame.ndim == 3 else frame
            out = join(dst, c, f"{vid}.npy")
            # tmp name must NOT end in .npy (make_dataset would enumerate a
            # crash leftover); np.save appends .npy to bare names, so write
            # through an open file object.
            with open(out + ".tmp", "wb") as f:
                np.save(f, video)
            os.replace(out + ".tmp", out)
            if delete_png:
                for f in frames:
                    os.remove(join(vdir, f))
            n += 1
            if n % 100 == 0:
                print(f"  {n} videos packed", flush=True)
    if n:
        from preprocessing.bair.pack import write_marker
        write_marker(dst, n)
    return n


def main():
    p = argparse.ArgumentParser(
        description="Pack KTH PNG frames into per-video raw .npy files.")
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True)
    p.add_argument("--nx", type=int, default=64, metavar="SIZE")
    p.add_argument("--delete_png", action="store_true",
                   help="Remove the source PNGs after packing each video.")
    args = p.parse_args()
    n = pack_tree(args.data_dir, args.nx, args.delete_png)
    print(f"packed {n} videos into "
          f"{join(args.data_dir, f'packed_{args.nx}')}", flush=True)


if __name__ == "__main__":
    main()
