"""Native C++ MMNIST engine: bit-parity with the Python generator + speed."""

import time

import numpy as np
import pytest

from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
from srvp_tpu.native import get_native_lib, mmnist_generate_batch


@pytest.fixture(scope="module")
def lib():
    lib = get_native_lib()
    if lib is None:
        pytest.skip("native engine unavailable (no compiler?)")
    return lib


@pytest.mark.parametrize("deterministic", [False, True])
def test_bit_parity_with_python(lib, deterministic):
    digits = synthetic_digits(13, np.random.RandomState(0))
    ds = MovingMNIST(digits, 64, 11, 4, deterministic, 2, True)
    seeds = [1, 42, 1234, 999983, 2**31 - 2]
    native = mmnist_generate_batch(digits, 64, 11, 4, deterministic, 2, seeds)
    for i, seed in enumerate(seeds):
        ref = ds.get_item(0, np.random.RandomState(seed))
        np.testing.assert_array_equal(native[i], ref)


def test_variable_digit_shapes(lib):
    rng = np.random.RandomState(3)
    digits = [rng.randint(0, 255, (h, w)).astype(np.uint8)
              for h, w in [(28, 28), (20, 24), (30, 17)]]
    ds = MovingMNIST(digits, 64, 6, 4, False, 3, True)
    native = mmnist_generate_batch(digits, 64, 6, 4, False, 3, [7, 8])
    for i, seed in enumerate([7, 8]):
        ref = ds.get_item(0, np.random.RandomState(seed))
        np.testing.assert_array_equal(native[i], ref)


def test_loader_uses_native_path(lib):
    from srvp_tpu.data.loader import DataLoader
    digits = synthetic_digits(9, np.random.RandomState(1))
    ds = MovingMNIST(digits, 64, 5, 4, False, 2, True)
    small = ds._filter(digits)
    loader = DataLoader(small, batch_size=4, seed=11, num_workers=2)
    native_batch = next(iter(loader))
    # force the python path and compare
    small2 = ds._filter(digits)
    small2.get_batch_seeded = lambda *a, **k: None
    loader2 = DataLoader(small2, batch_size=4, seed=11, num_workers=2)
    python_batch = next(iter(loader2))
    np.testing.assert_array_equal(native_batch, python_batch)


def test_speedup_report(lib):
    digits = synthetic_digits(50, np.random.RandomState(2))
    ds = MovingMNIST(digits, 64, 15, 4, False, 2, True)
    seeds = list(range(64))
    t0 = time.perf_counter()
    mmnist_generate_batch(digits, 64, 15, 4, False, 2, seeds, n_threads=1)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in seeds[:8]:
        ds.get_item(0, np.random.RandomState(s))
    t_python = (time.perf_counter() - t0) * (64 / 8)
    speedup = t_python / max(t_native, 1e-9)
    print(f"\nnative MMNIST speedup (1 thread): {speedup:.1f}x "
          f"({t_python*1000:.0f}ms -> {t_native*1000:.0f}ms per 64-batch)")
    assert speedup > 2  # conservative; typically 10-50x


def test_oversized_digit_raises_not_corrupts(lib):
    """A digit larger than the frame must raise (numpy randint parity), not
    dispatch to C++ where a wrapped rejection mask would write out of
    bounds."""
    rng = np.random.RandomState(0)
    big = [rng.randint(0, 255, (80, 80), dtype=np.uint8)]
    with pytest.raises(ValueError, match="do not fit"):
        mmnist_generate_batch(big, 64, 4, 4, False, 1,
                              np.arange(2, dtype=np.uint32))


def test_pack_cache_is_identity_checked(lib):
    """Two different digit lists must never share a cached pack (the old
    id()-keyed cache could serve stale digits after GC address reuse)."""
    d1 = synthetic_digits(3, np.random.RandomState(1))
    d2 = synthetic_digits(3, np.random.RandomState(2))
    seeds = np.arange(2, dtype=np.uint32)
    a1 = mmnist_generate_batch(d1, 64, 4, 4, False, 2, seeds)
    b = mmnist_generate_batch(d2, 64, 4, 4, False, 2, seeds)
    a2 = mmnist_generate_batch(d1, 64, 4, 4, False, 2, seeds)
    assert not np.array_equal(a1, b)       # different digits -> different videos
    np.testing.assert_array_equal(a1, a2)  # same digits -> stable
