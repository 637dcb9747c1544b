"""KTH end-to-end pipeline on a synthetic dataset tree: PNG frame loading,
random temporal crops, train fold filtering, test npz, vgg+skipco training."""

import numpy as np
import pytest
from PIL import Image

import jax

from srvp_tpu import train_lib
from srvp_tpu.data.base import collate_uint8, load_dataset
from srvp_tpu.data.kth import KTH
from srvp_tpu.data.loader import DataLoader
from srvp_tpu.helper import DotDict
from srvp_tpu.models.srvp import SRVPConfig


@pytest.fixture(scope="module")
def kth_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kth")
    rng = np.random.RandomState(0)
    for c in KTH.classes:
        (root / "processed_64" / c).mkdir(parents=True)
    for c in ["boxing", "walking"]:
        for person in [1, 2, 21]:  # 21 must be excluded from training
            vid = f"person{person:02d}_{c}_d1"
            d = root / "processed_64" / c / vid
            d.mkdir(exist_ok=True, parents=True)
            for t in range(12):
                img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"image-{t + 1:03d}.png")
    # precomputed test npz
    seqs = rng.randint(0, 255, (3, 8, 64, 64)).astype(np.uint8)
    np.savez_compressed(root / "svg_test_set_8.npz", sequences=seqs,
                        persons=[21, 22, 23], actions=["boxing"] * 3)
    return root


def test_kth_train_items_and_folds(kth_tree):
    ds = KTH.make_dataset(str(kth_tree), 64, 8, train=True)
    # persons > 20 excluded: 2 classes x 2 persons
    assert len(ds.data) == 4
    item = ds.get_item(0, np.random.RandomState(1))
    assert item.shape == (8, 64, 64) and item.dtype == np.uint8
    tr = ds.get_fold("train")
    va = ds.get_fold("val")
    assert len(tr.data) + len(va.data) == 4


def test_kth_test_fold(kth_tree):
    ds = KTH.make_dataset(str(kth_tree), 64, 8, train=False)
    assert len(ds) == 3
    assert ds.get_item(1, None).shape == (8, 64, 64)


def test_kth_vgg_training_step(kth_tree):
    config = DotDict(dataset="kth", data_dir=str(kth_tree), nx=64, seq_len=6)
    ds = load_dataset(config, train=True)
    loader = DataLoader(ds.get_fold("train"), batch_size=4, seed=0,
                        num_workers=2, collate_fn=collate_uint8)
    batch = next(iter(loader))
    assert batch.shape == (6, 4, 64, 64, 1) and batch.dtype == np.uint8

    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=True,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="vgg")
    hp = train_lib.TrainHParams(nt_cond=2, oversampling=2, obs_scale=0.2)
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp,
                                    res_gain=1.2)
    step = train_lib.make_train_step(cfg, hp)
    ts, m = step(ts, jax.numpy.asarray(batch))
    assert np.isfinite(float(m["loss"]))
