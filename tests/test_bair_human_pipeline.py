"""BAIR and Human3.6M pipelines on synthetic dataset trees."""

import numpy as np
import pytest
from PIL import Image

from srvp_tpu.data.bair import BAIR
from srvp_tpu.data.base import collate
from srvp_tpu.data.human import Human


class TestBAIR:
    @pytest.fixture(scope="class")
    def bair_tree(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("bair")
        rng = np.random.RandomState(0)
        for dname, n_files in [("train", 2), ("test", 1)]:
            for fi in range(n_files):
                for vi in range(1, 3):
                    d = root / "processed_data" / dname / f"traj_{fi}" / f"{vi:03d}"
                    d.mkdir(parents=True)
                    for t in range(30):
                        img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                        Image.fromarray(img).save(d / f"{t:03d}.png")
        return root

    def test_train_random_window(self, bair_tree):
        ds = BAIR.make_dataset(str(bair_tree), seq_len=12, train=True)
        assert len(ds.data) == 4
        x = ds.get_item(0, np.random.RandomState(1))
        assert x.shape == (12, 64, 64, 3) and x.dtype == np.uint8
        # different rng -> possibly different window; same rng -> same
        x2 = ds.get_item(0, np.random.RandomState(1))
        np.testing.assert_array_equal(x, x2)

    def test_test_starts_at_zero(self, bair_tree):
        ds = BAIR.make_dataset(str(bair_tree), seq_len=30, train=False)
        assert len(ds.data) == 2
        x = ds.get_item(0, None)
        assert x.shape == (30, 64, 64, 3)
        batch = collate([ds.get_item(i, None) for i in range(2)])
        assert batch.shape == (30, 2, 64, 64, 3)


class TestHuman:
    @pytest.fixture(scope="class")
    def human_tree(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("human")
        rng = np.random.RandomState(0)
        (root / "train").mkdir()
        (root / "test_set_4_2").mkdir()
        for i in range(3):
            vid = rng.randint(0, 255, (30, 64, 64, 3)).astype(np.uint8)
            np.savez(root / "train" / f"S1-video{i}.npz", image=vid,
                     filename=f"video{i}", subject=1)
        clip = rng.randint(0, 255, (7, 64, 64, 3)).astype(np.uint8)
        np.savez(root / "test_set_4_2" / "test_0.npz", image=clip, frame=0)
        return root

    def test_train_subsampling(self, human_tree):
        ds = Human.make_dataset(str(human_tree), 64, seq_len=4, subsampling=2,
                                train=True)
        assert ds.actual_seq_len == 7
        x = ds.get_item(0, np.random.RandomState(2))
        assert x.shape == (4, 64, 64, 3)

    def test_test_fold(self, human_tree):
        ds = Human.make_dataset(str(human_tree), 64, seq_len=4, subsampling=2,
                                train=False)
        x = ds.get_item(0, None)
        assert x.shape == (4, 64, 64, 3)  # 7 frames strided by 2
