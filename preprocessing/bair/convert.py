#!/usr/bin/env python
"""BAIR preprocessing: extracts 64x64 PNG frames from softmotion30_44k
tfrecords.

CLI/output parity with /root/reference/preprocessing/bair/convert.py
(processed_data/{train,test}/{file}/{idx:03d}/{frame:03d}.png, 30 frames per
video from feature '{i}/image_aux1/encoded'), but reads tfrecords natively —
no TensorFlow dependency (see tfrecord_reader.py).
"""

import argparse
import glob
import os

from PIL import Image

from preprocessing.bair.tfrecord_reader import parse_example, tfrecord_iterator


def get_seq(data_dir, dname):
    data_dir = os.path.join(data_dir, "softmotion30_44k", dname)
    filenames = sorted(glob.glob(os.path.join(data_dir, "*")))
    if not filenames:
        raise RuntimeError("No data files found.")
    for f in filenames:
        for k, payload in enumerate(tfrecord_iterator(f), start=1):
            example = parse_example(payload)
            image_seq = []
            for i in range(30):
                byte_str = example[f"{i}/image_aux1/encoded"][0]
                image_seq.append(Image.frombytes("RGB", (64, 64), byte_str))
            yield f, k, image_seq


def convert_data(data_dir, dname):
    for n, (f, k, seq) in enumerate(get_seq(data_dir, dname)):
        f = os.path.splitext(os.path.basename(f))[0]
        dirname = os.path.join(data_dir, "processed_data", dname, f, f"{k:03d}")
        os.makedirs(dirname)
        for i, img in enumerate(seq):
            img.save(os.path.join(dirname, f"{i:03d}.png"), "PNG")
        print(f"{dirname} ({n + 1})")


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        prog="BAIR preprocessing.",
        description="Generates training and testing videos for the BAIR dataset "
                    "from the original tfrecords; each frame saved as png.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--data_dir", type=str, metavar="DIR", required=True,
                   help="Folder where videos from the original dataset are stored.")
    args = p.parse_args()
    print("Train sequences...")
    convert_data(args.data_dir, "train")
    print(os.linesep)
    print("Test sequences...")
    convert_data(args.data_dir, "test")
