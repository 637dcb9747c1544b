"""scripts/make_synthetic_bair.py writes a tree the real BAIR stack loads."""

import subprocess
import sys

import numpy as np


def _run(out, seed):
    r = subprocess.run(
        [sys.executable, "scripts/make_synthetic_bair.py", "--out", str(out),
         "--n_train", "3", "--n_test", "2", "--seed", str(seed)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]


def test_tree_loads_through_bair_stack_and_is_reproducible(tmp_path):
    from srvp_tpu.data.bair import BAIR

    _run(tmp_path / "a", 5)
    ds = BAIR.make_dataset(str(tmp_path / "a"), seq_len=12, train=True)
    assert len(ds.data) == 3
    item = ds.get_item(0, np.random.RandomState(0))
    assert item.shape == (12, 64, 64, 3) and item.dtype == np.uint8
    # structured content, not flat noise: a static background plus moving
    # glyphs means frames differ over time but not maximally
    d = np.abs(np.diff(item.astype(int), axis=0)).mean()
    assert 0.1 < d < 40.0

    test_ds = BAIR.make_dataset(str(tmp_path / "a"), seq_len=30, train=False)
    assert len(test_ds.data) == 2
    assert test_ds.get_item(1).shape == (30, 64, 64, 3)

    # same seed -> byte-identical tree; different seed -> different pixels
    _run(tmp_path / "b", 5)
    _run(tmp_path / "c", 6)
    same = BAIR.make_dataset(str(tmp_path / "b"), 12, True)
    other = BAIR.make_dataset(str(tmp_path / "c"), 12, True)
    k = np.random.RandomState(0)
    np.testing.assert_array_equal(item, same.get_item(0, np.random.RandomState(0)))
    assert np.any(other.get_item(0, k) != item)
