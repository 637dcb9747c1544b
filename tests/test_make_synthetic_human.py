"""scripts/make_synthetic_human.py writes a tree the real Human stack loads."""

import subprocess
import sys

import numpy as np


def _run(out, seed, train_len="130", test_len="418"):
    r = subprocess.run(
        [sys.executable, "scripts/make_synthetic_human.py", "--out", str(out),
         "--n_train", "3", "--n_test", "2", "--train_len", train_len,
         "--test_len", test_len, "--seed", str(seed)],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]


def test_tree_loads_through_human_stack_and_is_reproducible(tmp_path):
    from srvp_tpu.data.human import Human

    _run(tmp_path / "a", 5)
    ds = Human.make_dataset(str(tmp_path / "a"), nx=64, seq_len=16,
                            subsampling=8, train=True)
    assert len(ds.data) == 3
    item = ds.get_item(0, np.random.RandomState(0))
    # stride-8 window of (16-1)*8+1 = 121 original frames
    assert item.shape == (16, 64, 64, 3) and item.dtype == np.uint8
    # structured content: static background + one slow glyph; consecutive
    # SUBSAMPLED frames differ but far from maximally
    d = np.abs(np.diff(item.astype(int), axis=0)).mean()
    assert 0.05 < d < 40.0

    # test fold: subjects S9/S11 only, videos long enough for the
    # seq_len_test=53 protocol via make_test_set.py ((53-1)*8+1 = 417)
    import os
    names = sorted(os.listdir(tmp_path / "a" / "test"))
    assert all(n.split("_")[0] in ("S9", "S11") for n in names)
    with np.load(tmp_path / "a" / "test" / names[0]) as arc:
        assert arc["image"].shape[0] >= 417
        assert arc["image"].shape[1:] == (64, 64, 3)

    # same seed -> byte-identical tree; different seed -> different pixels
    _run(tmp_path / "b", 5)
    _run(tmp_path / "c", 6)
    same = Human.make_dataset(str(tmp_path / "b"), 64, 16, 8, True)
    other = Human.make_dataset(str(tmp_path / "c"), 64, 16, 8, True)
    np.testing.assert_array_equal(
        item, same.get_item(0, np.random.RandomState(0)))
    assert np.any(other.get_item(0, np.random.RandomState(0)) != item)


def test_make_test_set_consumes_the_tree(tmp_path):
    """preprocessing/human/make_test_set.py runs unchanged on the tree."""
    from srvp_tpu.data.human import Human

    _run(tmp_path, 1)
    r = subprocess.run(
        [sys.executable, "preprocessing/human/make_test_set.py",
         "--data_dir", str(tmp_path), "--size", "4", "--seq_len", "53",
         "--subsampling", "8"],
        capture_output=True, text=True, timeout=300,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin", "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    ds = Human.make_dataset(str(tmp_path), nx=64, seq_len=53,
                            subsampling=8, train=False)
    assert len(ds.data) == 4
    assert ds.get_item(0).shape == (53, 64, 64, 3)
