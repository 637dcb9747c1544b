"""Offline dry run of scripts/convert_i3d.py against a synthetic TF graph.

The one untested link in the FVD chain was the TF-Hub variable-name -> npz
key mapping (the converter had only ever been written, never executed — no
network here). This test builds a real TensorFlow graph carrying the exact
variable names and shapes of the deepmind/i3d-kinetics-400/1 hub module
(scoped under a module name, as hub.Module does), runs the converter's
harvest on a live session, and feeds the resulting npz through
load_i3d_npz + i3d_apply.

Reference dependency being replaced: /root/reference/metrics/fvd/fvd.py:89-126.
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from convert_i3d import expected_variable_specs, harvest_session_variables  # noqa: E402
from srvp_tpu.metrics.i3d import i3d_apply, load_i3d_npz  # noqa: E402

tf_mod = pytest.importorskip("tensorflow")


def test_converter_dry_run_against_synthetic_hub_graph(tmp_path):
    tf = tf_mod.compat.v1
    specs = expected_variable_specs()
    rng = np.random.RandomState(0)

    with tf.Graph().as_default() as graph:
        for path, shape in specs:
            if path.endswith("moving_variance"):
                init = rng.uniform(0.5, 1.5, shape).astype(np.float32)
            else:
                init = rng.uniform(-0.05, 0.05, shape).astype(np.float32)
            # hub.Module(name="i3d") scopes every variable under "i3d/"
            tf.get_variable("i3d/" + path, initializer=init)
        # a variable outside the RGB tower must be ignored by the harvest
        tf.get_variable("i3d/global_step", initializer=np.int64(7))
        with tf.Session(graph=graph) as sess:
            sess.run(tf.global_variables_initializer())
            arrays = harvest_session_variables(tf.global_variables(), sess.run)

    assert set(arrays) == {path for path, _ in specs}
    out = tmp_path / "i3d.npz"
    np.savez_compressed(out, **arrays)

    params = load_i3d_npz(str(out))
    # BN broadcast shapes (1,1,1,1,C) must come out flat
    assert params["Conv3d_1a_7x7"]["beta"].ndim == 1
    videos = jnp.asarray(rng.uniform(-1, 1, (1, 16, 224, 224, 3))
                         .astype(np.float32))
    emb = i3d_apply(params, videos)
    assert emb.shape == (1, 400)
    assert np.all(np.isfinite(np.asarray(emb)))
