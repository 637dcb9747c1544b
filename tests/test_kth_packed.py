"""KTH packed-format fast path: identical to the PNG tree.

preprocessing/kth/pack.py coalesces each video's PNG frames into one raw
uint8 (T, nx, nx) .npy; srvp_tpu.data.kth.KTH auto-detects packed_{nx}/
and loads temporal crops via mmap with no decode. Pixels, video
enumeration order (fold-split-critical), person filtering, and seeded
window draws must match the PNG path exactly. Reference layout:
/root/reference/data/kth.py:134-151.
"""

import numpy as np
import pytest
from PIL import Image

from preprocessing.kth.pack import pack_tree
from srvp_tpu.data.base import collate_uint8
from srvp_tpu.data.kth import KTH
from srvp_tpu.data.loader import DataLoader


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kth_packed")
    rng = np.random.RandomState(4)
    for c in KTH.classes:
        (root / "processed_64" / c).mkdir(parents=True)
    # person 21 must be filtered out of the train fold in both formats;
    # varied video lengths exercise the window re-draw loop
    for c in ["boxing", "walking"]:
        for person, n_frames in [(1, 30), (2, 14), (3, 9), (21, 25)]:
            d = root / "processed_64" / c / f"person{person:02d}_{c}_d1"
            d.mkdir()
            for t in range(n_frames):
                img = rng.randint(0, 255, (64, 64, 3), dtype=np.uint8)
                Image.fromarray(img).save(d / f"image-{t + 1:03d}.png")
    n = pack_tree(str(root))
    assert n == 8  # person filter applies at load time, not pack time
    return root


@pytest.fixture(scope="module")
def both(tree):
    packed = KTH.make_dataset(str(tree), 64, 12, True)
    assert packed.packed
    (tree / "packed_64").rename(tree / "packed_64.bak")
    try:
        png = KTH.make_dataset(str(tree), 64, 12, True)
    finally:
        (tree / "packed_64.bak").rename(tree / "packed_64")
    assert not png.packed
    return png, packed


def test_person_filter_and_order(both):
    png, packed = both
    # persons 1-3 x 2 classes = 6 train videos; person 21 excluded
    assert len(png.data) == len(packed.data) == 6
    for vid_png, (path, n) in zip(png.data, packed.data):
        assert len(vid_png) == n


def test_items_bit_identical(both):
    png, packed = both
    for seed in [0, 7, 123, 4567]:
        np.testing.assert_array_equal(
            png.get_item(0, np.random.RandomState(seed)),
            packed.get_item(0, np.random.RandomState(seed)))


def test_short_video_redraw_matches(both):
    """seq_len 12 > the 9-frame video: the re-draw loop must consume RNG
    identically in both formats."""
    png, packed = both
    for seed in range(20):
        a, t0a = png._sample_window(np.random.RandomState(seed))
        b, t0b = packed._sample_window(np.random.RandomState(seed))
        assert t0a == t0b and len(a) == b[1]


def test_timemajor_batch_matches(both):
    png, packed = both
    seeds = [5, 6, 7, 8]
    b = packed.get_batch_timemajor_u8([0] * 4, seeds, n_threads=2)
    assert b.shape == (12, 4, 64, 64, 1) and b.dtype == np.uint8
    a = png.get_batch_timemajor_u8([0] * 4, seeds, n_threads=2)
    if a is not None:  # native decoder present
        np.testing.assert_array_equal(a, b)


def test_loader_batches_identical(both):
    png, packed = both
    kw = dict(batch_size=4, shuffle=True, drop_last=True, seed=5,
              num_workers=2, collate_fn=collate_uint8)
    it_a, it_b = iter(DataLoader(png, **kw)), iter(DataLoader(packed, **kw))
    for _ in range(3):
        np.testing.assert_array_equal(next(it_a), next(it_b))


def test_fold_split_format_invariant(both):
    png, packed = both
    for fold in ("train", "val"):
        a, b = png.get_fold(fold), packed.get_fold(fold)
        assert len(a.data) == len(b.data)
        for i in range(len(a.data)):
            assert len(a.data[i]) == b.data[i][1]
