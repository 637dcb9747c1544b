"""BAIR packed-format fast path: bit-identical to the PNG tree.

preprocessing/bair/pack.py coalesces each 30-PNG video into one raw uint8
.npy; srvp_tpu.data.bair.BAIR auto-detects packed_data/ and loads windows
via mmap with no PNG decode. Every seam must match the PNG path exactly:
same pixels, same video enumeration order (the seed-42 fold split depends
on it), same seeded window draws, same loader batches. Reference layout:
/root/reference/data/bair.py:76-121.
"""

import numpy as np
import pytest
from PIL import Image

from preprocessing.bair.pack import pack_fold
from srvp_tpu.data.bair import BAIR
from srvp_tpu.data.base import collate_uint8
from srvp_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bair_packed")
    rng = np.random.RandomState(3)
    for fold, n in (("train", 12), ("test", 3)):
        for i in range(n):
            d = (root / "processed_data" / fold / f"traj_{i // 4}" / str(i % 4))
            d.mkdir(parents=True)
            for t in range(30):
                Image.fromarray(
                    rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
                ).save(d / f"{t:02d}.png")
    n_train = pack_fold(str(root), "train")
    n_test = pack_fold(str(root), "test")
    assert (n_train, n_test) == (12, 3)
    return root


@pytest.fixture(scope="module")
def both(tree):
    packed = BAIR.make_dataset(str(tree), 12, True)
    assert packed.packed, "packed_data/ should be auto-detected"
    # hide packed_data to force the PNG path
    (tree / "packed_data").rename(tree / "packed_data.bak")
    try:
        png = BAIR.make_dataset(str(tree), 12, True)
    finally:
        (tree / "packed_data.bak").rename(tree / "packed_data")
    assert not png.packed
    return png, packed


def test_items_bit_identical(both):
    png, packed = both
    assert len(png.data) == len(packed.data)
    for idx in range(len(png.data)):
        rng_a, rng_b = np.random.RandomState(idx), np.random.RandomState(idx)
        np.testing.assert_array_equal(png.get_item(idx, rng_a),
                                      packed.get_item(idx, rng_b))


def test_timemajor_batch_matches_png_native(both):
    png, packed = both
    indices, seeds = [0, 3, 7], [11, 22, 33]
    a = png.get_batch_timemajor_u8(indices, seeds, n_threads=2)
    b = packed.get_batch_timemajor_u8(indices, seeds, n_threads=2)
    assert b.shape == (12, 3, 64, 64, 3) and b.dtype == np.uint8
    if a is not None:  # native decoder present
        np.testing.assert_array_equal(a, b)


def test_loader_batches_identical(both):
    png, packed = both
    kw = dict(batch_size=4, shuffle=True, drop_last=True, seed=5,
              num_workers=2, collate_fn=collate_uint8)
    for ba, bb in zip(DataLoader(png, **kw), DataLoader(packed, **kw)):
        np.testing.assert_array_equal(ba, bb)


def test_fold_split_is_format_invariant(both):
    png, packed = both
    for fold in ("train", "val"):
        a, b = png.get_fold(fold), packed.get_fold(fold)
        assert len(a.data) == len(b.data)
        # same videos selected: compare pixels of each fold member at t0=0
        for i in range(len(a.data)):
            rng = np.random.RandomState(0)
            np.testing.assert_array_equal(
                a.get_item(i, np.random.RandomState(1)),
                b.get_item(i, np.random.RandomState(1)))
        del rng


def test_test_fold_starts_at_zero(tree):
    packed = BAIR.make_dataset(str(tree), 9, False)
    assert packed.packed
    item = packed.get_item(0)
    raw = np.load(packed.data[0])
    np.testing.assert_array_equal(item, raw[:9])


def test_train_cli_on_packed_tree(tree, tmp_path):
    """train.py end to end with the packed loader path active (auto-detected
    packed_data/ — the production BAIR input service after pack.py)."""
    from srvp_tpu import args as args_mod
    from srvp_tpu.helper import DotDict
    from srvp_tpu.train_main import main as train_main

    xp_dir = tmp_path / "xp"
    argv = (f"--save_path {xp_dir} --dataset bair --data_dir {tree} "
            "--archi vgg --skipco --ny 4 --nz 4 --nt_cond 2 "
            "--nt_inf 2 --nc 3 --seq_len 5 --seed 9 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 8 --n_iter 2 "
            "--val_interval 4 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 2 --n_workers 2").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    from srvp_tpu.data.base import load_dataset
    assert load_dataset(opt, True).packed
    assert train_main(opt) == 0
    assert (xp_dir / "model.npz").exists()


def test_incomplete_packed_tree_falls_back(tree, caplog):
    """An interrupted pack run (missing marker, stale count, or a crash
    leftover tmp file) must never be consumed silently — make_dataset
    falls back to the PNG tree with a warning, and tmp names are never
    enumerated as videos."""
    import logging
    import os
    marker = tree / "packed_data" / "train" / "COMPLETE.json"
    backup = marker.read_text()

    # missing marker
    os.remove(marker)
    with caplog.at_level(logging.WARNING, logger="srvp_tpu.data.base"):
        ds = BAIR.make_dataset(str(tree), 12, True)
    assert not ds.packed
    assert any("COMPLETE.json" in r.message for r in caplog.records)

    # count mismatch (marker present but a video file missing)
    marker.write_text(backup)
    victim = next((tree / "packed_data" / "train" / "traj_0").glob("*.npy"))
    tmp_away = tree / "stash.npy"
    victim.rename(tmp_away)
    try:
        ds = BAIR.make_dataset(str(tree), 12, True)
        assert not ds.packed
    finally:
        tmp_away.rename(victim)

    # a crash-leftover tmp file must not be enumerated (name has no .npy
    # suffix by construction in pack.py)
    leftover = tree / "packed_data" / "train" / "traj_0" / "5.npy.tmp"
    leftover.write_bytes(b"garbage")
    try:
        ds = BAIR.make_dataset(str(tree), 12, True)
        assert ds.packed and len(ds.data) == 12
        assert not any(str(p).endswith(".tmp") for p in ds.data)
    finally:
        leftover.unlink()
