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
        assert rng is not None
        while True:
            vid = self.data[rng.randint(len(self.data))]
            if len(vid) >= self.seq_len:
                break
        t0 = rng.randint(len(vid) - self.seq_len + 1)
        x = np.zeros((self.seq_len, self.nx, self.nx), dtype=np.uint8)
        for t in range(self.seq_len):
            frame = np.array(Image.open(vid[t0 + t]))
            x[t] = frame[:, :, 0] if frame.ndim == 3 else frame
        return x

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
