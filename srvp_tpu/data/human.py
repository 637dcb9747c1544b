"""Human3.6M dataset: whole videos held in RAM as uint8 arrays.

Behavior parity with /root/reference/data/human.py: temporal subsampling with
stride `subsampling` over a window of (seq_len-1)*subsampling + 1 original
frames; training picks a random window, test starts at frame 0.
"""

import os

import numpy as np

from srvp_tpu.data.base import VideoDataset


class Human(VideoDataset):
    def __init__(self, data, nx, seq_len, subsampling, train):
        self.data = data
        self.nx = nx
        self.seq_len = seq_len
        self.train = train
        self.subsampling = subsampling
        self.actual_seq_len = (seq_len - 1) * subsampling + 1

    def change_seq_len(self, seq_len):
        self.seq_len = seq_len
        self.actual_seq_len = (seq_len - 1) * self.subsampling + 1

    def _filter(self, data):
        return Human(data, self.nx, self.seq_len, self.subsampling, self.train)

    def __len__(self):
        return 500000 if self.train else len(self.data)

    def get_item(self, index, rng=None):
        if not self.train:
            vid, t0 = self.data[index], 0
        else:
            assert rng is not None
            while True:
                vid = self.data[rng.randint(len(self.data))]
                if len(vid) >= self.actual_seq_len:
                    break
            t0 = rng.randint(len(vid) - self.actual_seq_len + 1)
        return vid[t0: t0 + self.actual_seq_len: self.subsampling]

    @classmethod
    def make_dataset(cls, data_dir, nx, seq_len, subsampling, train):
        folder = os.path.join(
            data_dir, "train" if train else f"test_set_{seq_len}_{subsampling}")
        data = []
        for video_file in sorted(os.listdir(folder)):
            with np.load(os.path.join(folder, video_file)) as arc:
                data.append(arc["image"])
        return cls(data, nx, seq_len, subsampling, train)
