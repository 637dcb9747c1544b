"""Native PNG input service: bit-parity with the PIL per-item path.

Covers VERDICT r2 item 4 (prove the input pipeline can feed KTH/BAIR): the
C++ batch decoder (native/png_decode.cpp — libdeflate fast path + libpng
fallback) must produce byte-identical batches to data/kth.py / data/bair.py
get_item for the same seeds, in both the per-item layout and the fully
collated time-major layout. Throughput is measured by
scripts/bench_loader.py. Reference equivalent: 4 torch DataLoader worker
processes (/root/reference/train.py:261-266).
"""

import os

import numpy as np
import pytest

from srvp_tpu.data.bair import BAIR
from srvp_tpu.data.base import collate_uint8
from srvp_tpu.data.kth import KTH
from srvp_tpu.data.loader import DataLoader
from srvp_tpu.native import get_native_lib


def _frame(rng, rgb=False):
    y, x = np.mgrid[0:64, 0:64]
    img = ((np.sin(x / 9.0 + rng.rand() * 6) + np.cos(y / 7.0 + rng.rand()))
           * 55 + 120).astype(np.uint8)
    if not rgb:
        return img
    return np.stack([img, np.roll(img, 3, 0), 255 - img], -1)


@pytest.fixture(scope="module")
def kth_tree(tmp_path_factory):
    from PIL import Image
    root = str(tmp_path_factory.mktemp("kth"))
    rng = np.random.RandomState(0)
    for i in range(6):
        cls = KTH.classes[i % len(KTH.classes)]
        vdir = os.path.join(root, "processed_64", cls,
                            f"person{(i % 20) + 1:02d}_{cls}_d{i}")
        os.makedirs(vdir)
        for t in range(12):
            # mix grayscale and RGB files: both occur in real trees and the
            # RGB->red-channel rule must match frame[:, :, 0]
            img = _frame(rng, rgb=(i % 2 == 0))
            Image.fromarray(img).save(os.path.join(vdir, f"{t:03d}.png"))
    return root


@pytest.fixture(scope="module")
def bair_tree(tmp_path_factory):
    from PIL import Image
    root = str(tmp_path_factory.mktemp("bair"))
    rng = np.random.RandomState(1)
    for i in range(5):
        vdir = os.path.join(root, "processed_data", "train", "traj_0", str(i))
        os.makedirs(vdir)
        for t in range(30):
            Image.fromarray(_frame(rng, rgb=True)).save(
                os.path.join(vdir, f"{t:02d}.png"))
    return root


def _require_native():
    if get_native_lib() is None:
        pytest.skip("native library unavailable")


def test_kth_native_batch_matches_pil(kth_tree):
    _require_native()
    ds = KTH.make_dataset(kth_tree, 64, 8, True)
    seeds = [11, 22, 33, 44]
    native = ds.get_batch_seeded(list(range(4)), seeds, n_threads=2)
    assert native is not None
    for b, seed in enumerate(seeds):
        ref = ds.get_item(0, np.random.RandomState(seed))
        np.testing.assert_array_equal(native[b], ref)


def test_kth_timemajor_matches_collate(kth_tree):
    _require_native()
    ds = KTH.make_dataset(kth_tree, 64, 8, True)
    seeds = [5, 6, 7]
    tm = ds.get_batch_timemajor_u8(list(range(3)), seeds, n_threads=2)
    assert tm is not None and tm.shape == (8, 3, 64, 64, 1)
    items = [ds.get_item(0, np.random.RandomState(s)) for s in seeds]
    np.testing.assert_array_equal(tm, collate_uint8(items))


def test_bair_native_batch_matches_pil(bair_tree):
    _require_native()
    ds = BAIR.make_dataset(bair_tree, 20, True)
    indices, seeds = [0, 2, 4], [9, 8, 7]
    native = ds.get_batch_seeded(indices, seeds, n_threads=2)
    assert native is not None
    for (idx, seed), got in zip(zip(indices, seeds), native):
        ref = ds.get_item(idx, np.random.RandomState(seed))
        np.testing.assert_array_equal(got, ref)
    tm = ds.get_batch_timemajor_u8(indices, seeds, n_threads=2)
    items = [ds.get_item(i, np.random.RandomState(s))
             for i, s in zip(indices, seeds)]
    np.testing.assert_array_equal(tm, collate_uint8(items))


def test_loader_uses_timemajor_path_and_matches_fallback(kth_tree):
    """End-to-end through DataLoader: the native time-major path must give
    byte-identical batches to the pure-Python fallback with the same
    loader seed."""
    _require_native()
    ds = KTH.make_dataset(kth_tree, 64, 8, True)

    class NoNative:
        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return 16

        def get_item(self, index, rng):
            return self._inner.get_item(index, rng)

    class Capped:
        """Native dataset view with a small epoch for the test."""

        def __init__(self, inner):
            self._inner = inner

        def __len__(self):
            return 16

        def __getattr__(self, name):
            return getattr(self._inner, name)

    mk = dict(batch_size=4, shuffle=True, drop_last=True, seed=3,
              num_workers=2, collate_fn=collate_uint8)
    batches_native = list(DataLoader(Capped(ds), **mk))
    batches_py = list(DataLoader(NoNative(ds), **mk))
    assert len(batches_native) == len(batches_py) == 4
    for a, b in zip(batches_native, batches_py):
        np.testing.assert_array_equal(a, b)


def test_kth_native_batch_with_misnamed_jpeg_matches_pil(tmp_path):
    """A tree containing a JPEG misnamed *.png (PIL sniffs content and
    accepts it; the native decoder rejects the signature) must still
    produce PIL-identical batches via the decoder's fallback, not kill
    the run (parity with the per-item path end to end)."""
    from PIL import Image
    _require_native()
    rng = np.random.RandomState(3)
    for c in KTH.classes:
        os.makedirs(os.path.join(str(tmp_path), "processed_64", c))
    cls = KTH.classes[0]
    vdir = os.path.join(str(tmp_path), "processed_64", cls,
                        f"person01_{cls}_d0")
    os.makedirs(vdir)
    for t in range(12):
        p = os.path.join(vdir, f"{t:03d}.png")
        if t == 5:
            Image.fromarray(_frame(rng, rgb=True)).save(
                p, format="JPEG", quality=95)
        else:
            Image.fromarray(_frame(rng)).save(p)
    ds = KTH.make_dataset(str(tmp_path), 64, 8, True)
    seeds = [11, 22]
    native = ds.get_batch_seeded([0, 0], seeds, n_threads=2)
    assert native is not None
    for b, seed in enumerate(seeds):
        ref = ds.get_item(0, np.random.RandomState(seed))
        np.testing.assert_array_equal(native[b], ref)
    tm = ds.get_batch_timemajor_u8([0, 0], seeds, n_threads=2)
    items = [ds.get_item(0, np.random.RandomState(s)) for s in seeds]
    np.testing.assert_array_equal(tm, collate_uint8(items))
