"""KTH action dataset: PNG frame directories (train) / precomputed npz (test).

Behavior parity with /root/reference/data/kth.py: train uses persons 1-20
from processed_{nx}/{action}/{video}/*.png with a random temporal crop; test
loads svg_test_set_{seq_len}.npz. Greyscale: only the first channel is kept.
"""

import os
from os.path import join

import numpy as np
from PIL import Image

from srvp_tpu.data.base import VideoDataset


class KTH(VideoDataset):
    classes = ["boxing", "handclapping", "handwaving", "jogging", "running", "walking"]

    def __init__(self, data, nx, seq_len, train):
        self.data = data
        self.nx = nx
        self.seq_len = seq_len
        self.train = train

    def change_seq_len(self, seq_len):
        self.seq_len = seq_len

    def _filter(self, data):
        return KTH(data, self.nx, self.seq_len, self.train)

    def __len__(self):
        return 500000 if self.train else len(self.data)

    def get_item(self, index, rng=None):
        if not self.train:
            return self.data[index]
        vid, t0 = self._sample_window(rng)
        x = np.zeros((self.seq_len, self.nx, self.nx), dtype=np.uint8)
        for t in range(self.seq_len):
            frame = np.array(Image.open(vid[t0 + t]))
            x[t] = frame[:, :, 0] if frame.ndim == 3 else frame
        return x

    def _sample_window(self, rng):
        """Random video + temporal crop; draw order matches get_item so the
        native batch path is bit-identical to the PIL path."""
        assert rng is not None
        while True:
            vid = self.data[rng.randint(len(self.data))]
            if len(vid) >= self.seq_len:
                break
        t0 = rng.randint(len(vid) - self.seq_len + 1)
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
        from srvp_tpu.native import decode_png_batch
        paths = self._batch_paths(indices, seeds)
        if paths is None:
            return None
        arr = decode_png_batch(paths, self.nx, self.nx, 1, n_threads)
        if arr is None:
            return None
        return arr.reshape(len(seeds), self.seq_len, self.nx, self.nx)

    def get_batch_timemajor_u8(self, indices, seeds, n_threads=4):
        """Fully-collated native batch: decodes straight into the
        (T, B, H, W, 1) uint8 layout collate_uint8 would produce — zero
        host-side restacking. None -> caller falls back."""
        from srvp_tpu.native import decode_png_timemajor
        paths = self._batch_paths(indices, seeds)
        if paths is None:
            return None
        return decode_png_timemajor(paths, len(seeds), self.seq_len,
                                    self.nx, self.nx, 1, n_threads)

    @classmethod
    def make_dataset(cls, data_dir, nx, seq_len, train):
        if train:
            root = join(data_dir, f"processed_{nx}")
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
        else:
            arc = np.load(join(data_dir, f"svg_test_set_{seq_len}.npz"),
                          allow_pickle=True)
            sequences = arc["sequences"]
            data = [sequences[i] for i in range(len(sequences))]
        return cls(data, nx, seq_len, train)
