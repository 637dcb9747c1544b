#!/usr/bin/env python
"""Exports the TF-Hub I3D kinetics-400 weights to the npz format
srvp_tpu.metrics.i3d.load_i3d_npz reads.

Run this in an environment with tensorflow (1.x or 2.x with compat) and
tensorflow_hub and network access (the same online dependency the reference
incurs at FVD time, /root/reference/metrics/fvd/fvd.py:89-126):

    python scripts/convert_i3d.py --out srvp_tpu/metrics/i3d.npz

Conv kernels are saved in their native TF layout (kt, kh, kw, in, out) =
DHWIO, which is what the JAX implementation consumes directly.

The variable-name -> npz-key mapping (harvest_session_variables) and the
full expected name/shape manifest (expected_variable_specs) are kept
separate from the network fetch so they can be exercised offline against a
synthetic TF graph carrying the real variable names — see
tests/test_convert_i3d.py.
"""

import argparse

import numpy as np


def expected_variable_specs():
    """The TF-Hub i3d-kinetics-400 variable manifest: [(path, shape), ...].

    Paths are relative to the module scope (they start with
    "RGB/inception_i3d/"), exactly as they appear in the hub graph and in
    the converted npz. Derived from the same tables the JAX model and
    loader use, so converter, loader and model cannot drift apart.
    """
    from srvp_tpu.metrics.i3d import (
        _BRANCH_PATHS, _MIXED, _STEM_SHAPES, _TF_ROOT, _branch_shapes)

    def unit(prefix, w_shape, bn=True, bias=False):
        oc = w_shape[-1]
        specs = [(f"{prefix}/conv_3d/w", w_shape)]
        if bias:
            specs.append((f"{prefix}/conv_3d/b", (oc,)))
        if bn:
            # tf.contrib-style broadcast shapes, as in the hub checkpoint
            specs += [(f"{prefix}/batch_norm/beta", (1, 1, 1, 1, oc)),
                      (f"{prefix}/batch_norm/moving_mean", (1, 1, 1, 1, oc)),
                      (f"{prefix}/batch_norm/moving_variance", (1, 1, 1, 1, oc))]
        return specs

    specs = []
    for name, shape in _STEM_SHAPES.items():
        specs += unit(f"{_TF_ROOT}/{name}", shape)
    for name in _MIXED:
        for (_, shape), (path, _) in zip(_branch_shapes(name), _BRANCH_PATHS):
            specs += unit(f"{_TF_ROOT}/{name}/{path}", shape)
    c = _MIXED["Mixed_5c"]
    c_final = c[0] + c[2] + c[4] + c[5]
    specs += unit(f"{_TF_ROOT}/Logits/Conv3d_0c_1x1", (1, 1, 1, c_final, 400),
                  bn=False, bias=True)
    return specs


def harvest_session_variables(variables, run):
    """Maps TF graph variables -> {npz key: array}.

    `variables`: iterable of objects with a `.name` like
    "<module-scope>/RGB/inception_i3d/.../w:0"; `run`: callable fetching a
    variable's value (e.g. sess.run). Everything before "RGB/" (the hub
    module scope, whatever it was named) is stripped; variables outside the
    RGB tower are ignored.
    """
    arrays = {}
    for var in variables:
        name = var.name.split(":")[0]
        idx = name.find("RGB/")
        if idx >= 0:
            arrays[name[idx:]] = run(var)
    return arrays


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
            arrays = harvest_session_variables(tf.global_variables(), sess.run)
    expected = dict(expected_variable_specs())
    missing = sorted(set(expected) - set(arrays))
    if missing:
        raise RuntimeError(
            f"hub graph is missing {len(missing)} expected variables, e.g. "
            f"{missing[:3]}")
    for key, shape in expected.items():
        got = tuple(arrays[key].shape)
        # only squeeze-equivalent shapes are tolerated (e.g. (1,1,1,C) vs
        # (C,)); same-numel permutations like a transposed conv kernel must
        # fail here, not silently corrupt the npz
        squeeze = lambda s: tuple(d for d in s if d != 1)
        if got != tuple(shape) and squeeze(got) != squeeze(shape):
            raise RuntimeError(f"{key}: shape {got} != expected {shape}")
    np.savez_compressed(out_path, **arrays)
    print(f"saved {len(arrays)} arrays to {out_path}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="srvp_tpu/metrics/i3d.npz")
    main(p.parse_args().out)
