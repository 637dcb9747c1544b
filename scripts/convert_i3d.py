#!/usr/bin/env python
"""Exports the TF-Hub I3D kinetics-400 weights to the npz format
srvp_tpu.metrics.i3d.load_i3d_npz reads.

Run this in an environment with tensorflow (1.x or 2.x with compat) and
tensorflow_hub and network access (the same online dependency the reference
incurs at FVD time, /root/reference/metrics/fvd/fvd.py:89-126):

    python scripts/convert_i3d.py --out srvp_tpu/metrics/i3d.npz

Conv kernels are saved in their native TF layout (kt, kh, kw, in, out) =
DHWIO, which is what the JAX implementation consumes directly.
"""

import argparse

import numpy as np


def main(out_path):
    import tensorflow.compat.v1 as tf
    import tensorflow_hub as hub

    tf.disable_eager_execution()
    with tf.Graph().as_default():
        videos = tf.placeholder(tf.float32, [16, 16, 224, 224, 3])
        module = hub.Module("https://tfhub.dev/deepmind/i3d-kinetics-400/1",
                            name="i3d")
        module(videos)
        with tf.Session() as sess:
            sess.run(tf.global_variables_initializer())
            arrays = {}
            for var in tf.global_variables():
                name = var.name.split(":")[0]
                # strip the module scope prefix, keep RGB/inception_i3d/...
                idx = name.find("RGB/")
                if idx >= 0:
                    arrays[name[idx:]] = sess.run(var)
    np.savez_compressed(out_path, **arrays)
    print(f"saved {len(arrays)} arrays to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="srvp_tpu/metrics/i3d.npz")
    main(p.parse_args().out)
