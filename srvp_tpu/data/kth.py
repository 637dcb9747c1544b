"""KTH action dataset: PNG frame directories (train) / precomputed npz (test).

Behavior parity with /root/reference/data/kth.py: train uses persons 1-20
from processed_{nx}/{action}/{video}/*.png with a random temporal crop; test
loads svg_test_set_{seq_len}.npz. Greyscale: only the first channel is kept.

Packed fast path: when `packed_{nx}/` exists (one raw uint8 (T, nx, nx)
.npy per video, produced by preprocessing/kth/pack.py), window loading is
a memory-mapped copy with no PNG decode — identical pixels, enumeration
order, fold splits, and window draws. Train-fold data entries are then
(path, n_frames) tuples instead of frame-path lists.
"""

import os
from os.path import join

import numpy as np
from PIL import Image

from srvp_tpu.data.base import VideoDataset, packed_tree_complete


class KTH(VideoDataset):
    classes = ["boxing", "handclapping", "handwaving", "jogging", "running", "walking"]

    def __init__(self, data, nx, seq_len, train, packed=False):
        self.data = data
        self.nx = nx
        self.seq_len = seq_len
        self.train = train
        self.packed = packed

    def change_seq_len(self, seq_len):
        self.seq_len = seq_len

    def _filter(self, data):
        return KTH(data, self.nx, self.seq_len, self.train, packed=self.packed)

    def __len__(self):
        return 500000 if self.train else len(self.data)

    def get_item(self, index, rng=None):
        if not self.train:
            return self.data[index]
        vid, t0 = self._sample_window(rng)
        if self.packed:
            return np.array(np.load(vid[0], mmap_mode="r")
                            [t0:t0 + self.seq_len])
        x = np.zeros((self.seq_len, self.nx, self.nx), dtype=np.uint8)
        for t in range(self.seq_len):
            frame = np.array(Image.open(vid[t0 + t]))
            x[t] = frame[:, :, 0] if frame.ndim == 3 else frame
        return x

    def _video_len(self, vid):
        return vid[1] if self.packed else len(vid)

    def _sample_window(self, rng):
        """Random video + temporal crop; draw order matches get_item so the
        native batch path is bit-identical to the PIL path."""
        assert rng is not None
        while True:
            vid = self.data[rng.randint(len(self.data))]
            if self._video_len(vid) >= self.seq_len:
                break
        t0 = rng.randint(self._video_len(vid) - self.seq_len + 1)
        return vid, t0

    def _batch_paths(self, indices, seeds):
        """The batch's frame paths in draw order. THE parity-critical spot:
        same seeds -> same windows -> same pixels as the per-item PIL path
        (get_item), for both native decode layouts. None on test folds
        (whose data are arrays, not paths)."""
        if not self.train:
            return None
        paths = []
        for seed in seeds:
            vid, t0 = self._sample_window(np.random.RandomState(seed))
            paths.extend(vid[t0:t0 + self.seq_len])
        return paths

    def get_batch_seeded(self, indices, seeds, n_threads=4):
        """Native input service: one C++ decode pass for the whole batch's
        frame files (native/png_decode.cpp); returns None (fall back to
        Python) when the native library is unavailable."""
        if self.packed:
            return None  # the timemajor path below covers packed batches
        from srvp_tpu.native import decode_png_batch
        paths = self._batch_paths(indices, seeds)
        if paths is None:
            return None
        arr = decode_png_batch(paths, self.nx, self.nx, 1, n_threads)
        if arr is None:
            return None
        return arr.reshape(len(seeds), self.seq_len, self.nx, self.nx)

    def get_batch_timemajor_u8(self, indices, seeds, n_threads=4):
        """Fully-collated native batch: frames land straight in the
        (T, B, H, W, 1) uint8 layout collate_uint8 would produce — zero
        host-side restacking. Packed videos are mmapped window copies (no
        decode); PNG trees go through the C++ decoder. None -> caller
        falls back."""
        if not self.train:
            return None
        if self.packed:
            out = np.empty((self.seq_len, len(seeds), self.nx, self.nx, 1),
                           np.uint8)
            for b, seed in enumerate(seeds):
                vid, t0 = self._sample_window(np.random.RandomState(seed))
                out[:, b, :, :, 0] = np.load(vid[0], mmap_mode="r")[
                    t0:t0 + self.seq_len]
            return out
        from srvp_tpu.native import decode_png_timemajor
        paths = self._batch_paths(indices, seeds)
        if paths is None:
            return None
        return decode_png_timemajor(paths, len(seeds), self.seq_len,
                                    self.nx, self.nx, 1, n_threads)

    @classmethod
    def make_dataset(cls, data_dir, nx, seq_len, train, prefer_packed=True):
        if train:
            packed_root = join(data_dir, f"packed_{nx}")
            if prefer_packed and os.path.isdir(packed_root):
                all_npy = []   # every packed video (marker-count validation)
                for c in cls.classes:
                    cdir = join(packed_root, c)
                    if not os.path.isdir(cdir):
                        continue
                    all_npy.extend(
                        (c, f) for f in sorted(
                            os.listdir(cdir),
                            key=lambda f: os.path.splitext(f)[0])
                        if f.endswith(".npy"))
                if packed_tree_complete(packed_root, len(all_npy)):
                    data = []
                    for c, f in all_npy:
                        # persons 21-25 are reserved for the test set
                        if int(f.split("_")[0][-2:]) > 20:
                            continue
                        path = join(packed_root, c, f)
                        n = len(np.load(path, mmap_mode="r"))
                        data.append((path, n))
                    return cls(data, nx, seq_len, train, packed=True)
            root = join(data_dir, f"processed_{nx}")
            if not os.path.isdir(root):
                raise FileNotFoundError(
                    f"no KTH PNG tree at {root} (and no usable packed tree "
                    f"under {data_dir}); if the PNGs were removed with "
                    "`pack.py --delete_png`, re-run preprocessing/kth/pack.py "
                    "so the packed tree carries a valid COMPLETE.json marker")
            data = []
            for c in cls.classes:
                for vid in sorted(os.listdir(join(root, c))):
                    vdir = join(root, c, vid)
                    if not os.path.isdir(vdir):
                        continue
                    # persons 21-25 are reserved for the test set
                    if int(vid.split("_")[0][-2:]) > 20:
                        continue
                    data.append(sorted(
                        join(vdir, img) for img in os.listdir(vdir)
                        if os.path.splitext(img)[1] == ".png"))
            if not any(data):
                raise ValueError(
                    f"KTH PNG tree at {root} enumerated no frames; if the "
                    "PNGs were removed with `pack.py --delete_png`, re-run "
                    "preprocessing/kth/pack.py to restore a valid packed "
                    "tree (COMPLETE.json marker)")
        else:
            arc = np.load(join(data_dir, f"svg_test_set_{seq_len}.npz"),
                          allow_pickle=True)
            sequences = arc["sequences"]
            data = [sequences[i] for i in range(len(sequences))]
        return cls(data, nx, seq_len, train)
