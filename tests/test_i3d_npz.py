"""I3D npz weight-loading roundtrip (TF variable-path key format)."""

import numpy as np

import jax

from srvp_tpu.metrics.i3d import (
    _BRANCH_PATHS, _MIXED, _STEM_SHAPES, _branch_shapes, i3d_random_params,
    load_i3d_npz)


def test_npz_roundtrip(tmp_path):
    params = i3d_random_params(jax.random.PRNGKey(0))
    arrays = {}
    root = "RGB/inception_i3d"

    def dump(prefix, p, bn=True, bias=False):
        arrays[f"{prefix}/conv_3d/w"] = np.asarray(p["w"])
        if bias:
            arrays[f"{prefix}/conv_3d/b"] = np.asarray(p["b"])
        if bn:
            # TF stores BN params with trailing singleton dims
            arrays[f"{prefix}/batch_norm/beta"] = np.asarray(p["beta"]).reshape(
                1, 1, 1, 1, -1)
            arrays[f"{prefix}/batch_norm/moving_mean"] = np.asarray(
                p["mean"]).reshape(1, 1, 1, 1, -1)
            arrays[f"{prefix}/batch_norm/moving_variance"] = np.asarray(
                p["var"]).reshape(1, 1, 1, 1, -1)

    for name in _STEM_SHAPES:
        dump(f"{root}/{name}", params[name])
    for name in _MIXED:
        for (key, _), (path, _) in zip(_branch_shapes(name), _BRANCH_PATHS):
            dump(f"{root}/{name}/{path}", params[name][key])
    dump(f"{root}/Logits/Conv3d_0c_1x1", params["Logits"], bn=False, bias=True)

    np.savez(tmp_path / "i3d.npz", **arrays)
    loaded = load_i3d_npz(tmp_path / "i3d.npz")
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b).reshape(
            np.asarray(a).shape))
