"""Dataset registry, collate, and fold splitting.

Behavior parity with /root/reference/data/base.py:
  * load_dataset dispatch by config.dataset (base.py:21-51)
  * deterministic 95/5 train/val split with a seed-42 RandomState shuffle,
    preserving original item order within each fold (base.py:116-128)
  * collate merges uint8 (T,H,W[,C]) videos into float32 [0,1] batches —
    here with TPU layout (T, B, H, W, C) instead of (T, B, C, H, W)

Datasets expose `get_item(index, rng)` with an EXPLICIT numpy RandomState:
randomness is an argument, not process-global state, so multi-threaded
prefetching stays deterministic (SURVEY.md §5 race-detection note).
"""

import json
import logging
import os

import numpy as np

logger = logging.getLogger(__name__)


def packed_tree_complete(packed_root, n_found):
    """True iff `packed_root` carries the pack script's completion marker
    and its video count matches what was enumerated. An interrupted pack
    run (partial tree, no marker, or stale count) must never be consumed
    silently — it would shrink the dataset and shift the seed-42 fold
    split; warn and let the caller fall back to the PNG tree."""
    marker = os.path.join(packed_root, "COMPLETE.json")
    if not os.path.exists(marker):
        logger.warning("ignoring packed tree %s: no COMPLETE.json marker "
                       "(interrupted pack run, or a tree packed by a "
                       "pre-marker pack.py — re-run pack.py to stamp it); "
                       "falling back to PNG frames", packed_root)
        return False
    try:
        with open(marker) as f:
            expected = json.load(f).get("videos")
    except (ValueError, AttributeError, OSError) as e:
        # A truncated or hand-edited marker must take the documented
        # warn-and-fall-back path, not crash make_dataset.
        logger.warning("ignoring packed tree %s: unreadable COMPLETE.json "
                       "(%s); falling back to PNG frames", packed_root, e)
        return False
    if expected != n_found:
        logger.warning("ignoring packed tree %s: marker says %s videos but "
                       "%d enumerated; falling back to PNG frames",
                       packed_root, expected, n_found)
        return False
    return True


def load_dataset(config, train):
    """Builds the dataset named by config.dataset ('smmnist'|'kth'|'human'|'bair')."""
    name = config.dataset
    if name == "smmnist":
        from srvp_tpu.data.mmnist import MovingMNIST
        return MovingMNIST.make_dataset(config.data_dir, config.nx, config.seq_len,
                                        config.max_speed, config.deterministic,
                                        config.ndigits, train,
                                        allow_synthetic=bool(
                                            config.get("allow_synthetic", False)
                                            if hasattr(config, "get") else
                                            getattr(config, "allow_synthetic", False)))
    if name == "kth":
        from srvp_tpu.data.kth import KTH
        return KTH.make_dataset(config.data_dir, config.nx, config.seq_len, train)
    if name == "human":
        from srvp_tpu.data.human import Human
        return Human.make_dataset(config.data_dir, config.nx, config.seq_len,
                                  config.subsampling, train)
    if name == "bair":
        from srvp_tpu.data.bair import BAIR
        return BAIR.make_dataset(config.data_dir, config.seq_len, train)
    raise ValueError(f"No dataset named '{name}'")


def collate(videos):
    """uint8 videos [(T,H,W) or (T,H,W,C)] -> float32 (T, B, H, W, C) in [0,1]."""
    batch = np.stack([v if v.ndim == 4 else v[..., None] for v in videos], axis=1)
    return np.ascontiguousarray(batch, dtype=np.float32) / 255.0


def collate_uint8(videos):
    """uint8 videos -> uint8 (T, B, H, W, C). The [0,1] float conversion
    happens ON DEVICE (srvp_tpu.objectives), so host->device transfers ship
    4x fewer bytes — the TPU input-pipeline pattern (frames stay uint8 until
    the last moment)."""
    batch = np.stack([v if v.ndim == 4 else v[..., None] for v in videos], axis=1)
    return np.ascontiguousarray(batch)


class VideoDataset:
    """Abstract video dataset; subclasses provide `data`, `train`,
    `get_item(index, rng)` and `_filter(data)`."""

    def get_fold(self, fold):
        if fold in ("train", "val"):
            assert self.train
            rng = np.random.RandomState(42)
            rand_ids = list(range(len(self.data)))
            rng.shuffle(rand_ids)
            n_train = int(0.95 * len(rand_ids))
            keep = set(rand_ids[:n_train] if fold == "train" else rand_ids[n_train:])
            data = [x for i, x in enumerate(self.data) if i in keep]
        else:
            assert fold == "test" and not self.train
            data = self.data
        return self._filter(data)

    def change_seq_len(self, seq_len):
        raise NotImplementedError

    def __len__(self):
        return len(self.data)

    def get_item(self, index, rng):
        raise NotImplementedError

    def _filter(self, data):
        raise NotImplementedError
