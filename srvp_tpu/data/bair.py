"""BAIR robot-pushing dataset: PNG frame directories, 30-frame videos.

Behavior parity with /root/reference/data/bair.py: processed_data/{train,test}
directory trees; training picks a random 30-frame-window start, test starts
at frame 0.
"""

import os
from os.path import join

import numpy as np
from PIL import Image

from srvp_tpu.data.base import VideoDataset


class BAIR(VideoDataset):
    def __init__(self, data, seq_len, train):
        assert seq_len <= 30
        self.data = data
        self.nx = 64
        self.nc = 3
        self.seq_len = seq_len
        self.train = train

    def change_seq_len(self, seq_len):
        self.seq_len = seq_len

    def _filter(self, data):
        return BAIR(data, self.seq_len, self.train)

    def get_item(self, index, rng=None):
        vid = self.data[index]
        t0 = rng.randint(30 - self.seq_len + 1) if self.train else 0
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
        from srvp_tpu.native import decode_png_batch
        paths = self._batch_paths(indices, seeds)
        arr = decode_png_batch(paths, self.nx, self.nx, self.nc, n_threads)
        if arr is None:
            return None
        return arr.reshape(len(indices), self.seq_len, self.nx, self.nx,
                           self.nc)

    def get_batch_timemajor_u8(self, indices, seeds, n_threads=4):
        """Fully-collated native batch: decodes straight into the
        (T, B, H, W, C) uint8 layout collate_uint8 would produce — zero
        host-side restacking. None -> caller falls back."""
        from srvp_tpu.native import decode_png_timemajor
        paths = self._batch_paths(indices, seeds)
        return decode_png_timemajor(paths, len(indices), self.seq_len,
                                    self.nx, self.nx, self.nc, n_threads)

    @classmethod
    def make_dataset(cls, data_dir, seq_len, train):
        root = join(data_dir, "processed_data", "train" if train else "test")
        data = []
        for d1 in sorted(os.listdir(root)):
            for d2 in sorted(os.listdir(join(root, d1))):
                data.append(sorted(
                    join(root, d1, d2, img) for img in os.listdir(join(root, d1, d2))
                    if os.path.splitext(img)[1] == ".png"))
        return cls(data, seq_len, train)
