"""BAIR robot-pushing dataset: PNG frame directories, 30-frame videos.

Behavior parity with /root/reference/data/bair.py: processed_data/{train,test}
directory trees; training picks a random 30-frame-window start, test starts
at frame 0.

Packed fast path: when `packed_data/{fold}/` exists (one raw uint8
(30, 64, 64, 3) .npy per video, produced by preprocessing/bair/pack.py),
loading is a memory-mapped window copy with no PNG decode — bit-identical
pixels, an order of magnitude less host CPU per frame. The same
file-per-video design the reference uses for Human3.6M
(/root/reference/data/human.py:60-65).
"""

import os
from os.path import join

import numpy as np
from PIL import Image

from srvp_tpu.data.base import VideoDataset, packed_tree_complete


class BAIR(VideoDataset):
    def __init__(self, data, seq_len, train, packed=False):
        assert seq_len <= 30
        self.data = data
        self.nx = 64
        self.nc = 3
        self.seq_len = seq_len
        self.train = train
        self.packed = packed

    def change_seq_len(self, seq_len):
        self.seq_len = seq_len

    def _filter(self, data):
        return BAIR(data, self.seq_len, self.train, packed=self.packed)

    def _window_start(self, rng):
        return rng.randint(30 - self.seq_len + 1) if self.train else 0

    def get_item(self, index, rng=None):
        t0 = self._window_start(rng) if self.train else 0
        if self.packed:
            vid = np.load(self.data[index], mmap_mode="r")
            return np.array(vid[t0:t0 + self.seq_len])
        vid = self.data[index]
        x = np.zeros((self.seq_len, self.nx, self.nx, self.nc), dtype=np.uint8)
        for t in range(self.seq_len):
            x[t] = np.array(Image.open(vid[t0 + t]))
        return x

    def _batch_paths(self, indices, seeds):
        """The batch's frame paths in draw order. THE parity-critical spot:
        same seeds -> same windows -> same pixels as the per-item PIL path
        (get_item), for both native decode layouts."""
        paths = []
        for idx, seed in zip(indices, seeds):
            vid = self.data[idx]
            t0 = np.random.RandomState(seed).randint(30 - self.seq_len + 1) \
                if self.train else 0
            paths.extend(vid[t0:t0 + self.seq_len])
        return paths

    def get_batch_seeded(self, indices, seeds, n_threads=4):
        """Native input service: one C++ decode pass for the whole batch's
        frame files (native/png_decode.cpp); None when the native library
        is unavailable."""
        if self.packed:
            return None  # the timemajor path below covers packed batches
        from srvp_tpu.native import decode_png_batch
        paths = self._batch_paths(indices, seeds)
        arr = decode_png_batch(paths, self.nx, self.nx, self.nc, n_threads)
        if arr is None:
            return None
        return arr.reshape(len(indices), self.seq_len, self.nx, self.nx,
                           self.nc)

    def get_batch_timemajor_u8(self, indices, seeds, n_threads=4):
        """Fully-collated native batch: frames land straight in the
        (T, B, H, W, C) uint8 layout collate_uint8 would produce — zero
        host-side restacking. Packed videos are mmapped window copies (no
        decode); PNG trees go through the C++ decoder. None -> caller
        falls back."""
        if self.packed:
            out = np.empty((self.seq_len, len(indices), self.nx, self.nx,
                            self.nc), np.uint8)
            for b, (idx, seed) in enumerate(zip(indices, seeds)):
                t0 = self._window_start(np.random.RandomState(seed))
                vid = np.load(self.data[idx], mmap_mode="r")
                out[:, b] = vid[t0:t0 + self.seq_len]
            return out
        from srvp_tpu.native import decode_png_timemajor
        paths = self._batch_paths(indices, seeds)
        return decode_png_timemajor(paths, len(indices), self.seq_len,
                                    self.nx, self.nx, self.nc, n_threads)

    @classmethod
    def make_dataset(cls, data_dir, seq_len, train, prefer_packed=True):
        fold = "train" if train else "test"
        packed_root = join(data_dir, "packed_data", fold)
        if prefer_packed and os.path.isdir(packed_root):
            # same nested sorted walk as the PNG tree, so the video order
            # (and the seed-42 fold split downstream) is format-invariant
            data = [join(packed_root, d1, f)
                    for d1 in sorted(os.listdir(packed_root))
                    if os.path.isdir(join(packed_root, d1))
                    for f in sorted(os.listdir(join(packed_root, d1)),
                                    key=lambda f: os.path.splitext(f)[0])
                    if f.endswith(".npy")]
            if packed_tree_complete(packed_root, len(data)):
                return cls(data, seq_len, train, packed=True)
        root = join(data_dir, "processed_data", fold)
        if not os.path.isdir(root):
            raise FileNotFoundError(
                f"no BAIR PNG tree at {root} (and no usable packed tree "
                f"under {data_dir}); if the PNGs were removed with "
                "`pack.py --delete_png`, re-run preprocessing/bair/pack.py "
                "so the packed tree carries a valid COMPLETE.json marker")
        data = []
        for d1 in sorted(os.listdir(root)):
            for d2 in sorted(os.listdir(join(root, d1))):
                data.append(sorted(
                    join(root, d1, d2, img) for img in os.listdir(join(root, d1, d2))
                    if os.path.splitext(img)[1] == ".png"))
        if not any(data):
            raise ValueError(
                f"BAIR PNG tree at {root} enumerated no frames; if the PNGs "
                "were removed with `pack.py --delete_png`, re-run "
                "preprocessing/bair/pack.py to restore a valid packed tree "
                "(COMPLETE.json marker)")
        return cls(data, seq_len, train)
