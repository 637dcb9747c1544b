"""Threaded prefetching data loader.

Replaces the reference's torch DataLoader worker subprocesses
(/root/reference/train.py:261-266) with a deterministic thread-pool pipeline:
item randomness comes from per-item RandomStates derived from (seed, epoch,
position), never shared global state, so results are reproducible for any
thread count. Batches are prefetched on a background thread so host data
work overlaps device steps (the classic TPU input-pipeline pattern).
"""

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from srvp_tpu.data.base import collate


class _ProducerError:
    """Sentinel carrying an exception out of the producer thread, so a bad
    item (e.g. a corrupt PNG raising in the native decoder) fails the
    training loop instead of hanging the consumer on a queue that will
    never receive its end-of-epoch None."""

    def __init__(self, exc):
        self.exc = exc


class DataLoader:
    """`shard_rank`/`shard_count` feed multi-process SPMD training
    (parallel/multihost.py): `batch_size` stays the GLOBAL batch size — the
    epoch order, batch count and per-item seeds are computed exactly as in
    the unsharded loader — but each process fetches and collates only its
    contiguous `batch_size/shard_count` slice of every batch. Item
    randomness depends only on (seed, epoch, position), so the shards of a
    batch concatenate bit-identically to the unsharded batch for any
    process count (the reference's DistributedSampler has no such
    guarantee: it re-partitions the epoch, /root/reference/train.py:254-259).
    """

    def __init__(self, dataset, batch_size, shuffle=True, drop_last=True,
                 seed=0, num_workers=4, prefetch=2, collate_fn=collate,
                 shard_rank=0, shard_count=1):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.collate_fn = collate_fn
        self.epoch = 0
        self._start_batch = 0
        if shard_count > 1:
            if not 0 <= shard_rank < shard_count:
                raise ValueError(f"shard_rank {shard_rank} out of range "
                                 f"for shard_count {shard_count}")
            if batch_size % shard_count:
                raise ValueError(
                    f"batch_size {batch_size} must divide evenly over "
                    f"shard_count {shard_count}")
            if not drop_last:
                raise ValueError(
                    "sharded loading requires drop_last=True (a ragged "
                    "final batch cannot be split evenly across processes)")
        self.shard_rank = shard_rank
        self.shard_count = shard_count

    def fast_forward(self, n_batches):
        """Advances the deterministic batch stream by n_batches WITHOUT
        generating them (epoch order and per-item seeds depend only on
        (seed, epoch, position), so skipping is free).

        Used on --resume so a resumed run consumes the exact same data
        sequence an uninterrupted run would have — the reference has no
        equivalent (a torch DataLoader restart replays the stream from the
        beginning)."""
        per_epoch = max(len(self), 1)
        self.epoch += n_batches // per_epoch
        self._start_batch = n_batches % per_epoch

    def __len__(self):
        n = len(self.dataset)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _epoch_indices(self):
        n = len(self.dataset)
        if self.shuffle:
            order = np.random.RandomState(
                (self.seed + 0x9E3779B1 * self.epoch) % (2**31 - 1)).permutation(n)
        else:
            order = np.arange(n)
        return order

    def __iter__(self):
        order = self._epoch_indices()
        n_batches = len(self)
        epoch = self.epoch
        self.epoch += 1
        start_batch = self._start_batch
        self._start_batch = 0  # an offset applies to one epoch only

        def item_seed(pos):
            return (self.seed * 1_000_003 + epoch * 7_777_777 + pos) % (2**31 - 1)

        def fetch(pos):
            idx = int(order[pos])
            return self.dataset.get_item(idx, np.random.RandomState(item_seed(pos)))

        native_fn = getattr(self.dataset, "get_batch_seeded", None)
        # When the consumer wants the production uint8 time-major layout,
        # prefer the fully-collated native path: frames decode straight
        # into the (T, B, H, W, C) batch with no host restacking.
        from srvp_tpu.data.base import collate_uint8
        tm_fn = getattr(self.dataset, "get_batch_timemajor_u8", None) \
            if self.collate_fn is collate_uint8 else None
        out_q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def producer():
            try:
                with ThreadPoolExecutor(self.num_workers) as pool:
                    per_shard = self.batch_size // self.shard_count
                    for b in range(start_batch, n_batches):
                        if stop.is_set():
                            return
                        lo = b * self.batch_size
                        hi = min(lo + self.batch_size, len(order))
                        if self.shard_count > 1:
                            # This process's contiguous slice of the global
                            # batch (drop_last guarantees hi - lo == the full
                            # batch, so the slice bounds are always valid).
                            lo += self.shard_rank * per_shard
                            hi = lo + per_shard
                        indices = [int(order[p]) for p in range(lo, hi)]
                        seeds = [item_seed(p) for p in range(lo, hi)]
                        batch = None
                        if tm_fn is not None:
                            batch = tm_fn(indices, seeds, self.num_workers)
                        if batch is None and native_fn is not None:
                            arr = native_fn(indices, seeds, self.num_workers)
                            if isinstance(arr, dict):  # pre-collated parts
                                batch = arr
                            elif arr is not None:
                                batch = self.collate_fn(list(arr))
                        if batch is None:
                            batch = self.collate_fn(
                                list(pool.map(fetch, range(lo, hi))))
                        out_q.put(batch)
                out_q.put(None)
            except BaseException as e:  # propagate to the consumer
                out_q.put(_ProducerError(e))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                batch = out_q.get()
                if batch is None:
                    return
                if isinstance(batch, _ProducerError):
                    raise batch.exc
                yield batch
        finally:
            stop.set()
            # Drain so the producer can exit if the consumer stopped early.
            while thread.is_alive():
                try:
                    out_q.get_nowait()
                except queue.Empty:
                    break


def infinite_batches(loader):
    """Cycles a DataLoader forever (the reference's while-not-finished loop,
    train.py:332-336)."""
    while True:
        yield from loader


class PartsView:
    """Adapter exposing a dataset's get_item_parts as get_item, for loaders
    that feed the on-device compositor (srvp_tpu/data/device_compose.py).
    Prefers the native parts batch path when the dataset provides one."""

    def __init__(self, dataset):
        self._dataset = dataset

    def __len__(self):
        return len(self._dataset)

    def get_item(self, index, rng):
        return self._dataset.get_item_parts(index, rng)

    def get_batch_seeded(self, indices, seeds, n_threads=4):
        fn = getattr(self._dataset, "get_parts_batch_seeded", None)
        return fn(indices, seeds, n_threads) if fn is not None else None
