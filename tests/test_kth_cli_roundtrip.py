"""KTH train.py -> test.py CLI roundtrip on a synthetic PNG tree.

tests/test_roundtrip.py covers the CLI surfaces on smmnist (on-the-fly
generation + device compositing); this covers the OTHER data shape the
framework serves — PNG-frame datasets through the uint8 collate path —
end to end: train_main with the KTH loader (person folds, temporal crops,
val split of real videos), checkpoint save, then test.py consuming the
written config.json and svg_test_set npz (reference protocol:
/root/reference/data/kth.py + /root/reference/test.py:185-204).
"""

import numpy as np
import pytest
from PIL import Image

import test as test_cli
from srvp_tpu import args as args_mod
from srvp_tpu.data.kth import KTH
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main as train_main


@pytest.fixture(scope="module")
def kth_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("kth_cli")
    rng = np.random.RandomState(7)
    for c in KTH.classes:
        (root / "processed_64" / c).mkdir(parents=True)
    for c in ["boxing", "walking"]:
        for person in [1, 2, 3, 4]:
            d = root / "processed_64" / c / f"person{person:02d}_{c}_d1"
            d.mkdir(exist_ok=True, parents=True)
            for t in range(10):
                img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"image-{t + 1:03d}.png")
    seqs = rng.randint(0, 255, (4, 8, 64, 64)).astype(np.uint8)
    np.savez_compressed(root / "svg_test_set_8.npz", sequences=seqs,
                        persons=[21, 22, 23, 24], actions=["boxing"] * 4)
    return root


def test_kth_train_then_test_roundtrip(kth_tree, tmp_path):
    xp_dir = tmp_path / "xp"

    # the reference KTH recipe's structural flags at tiny widths
    argv = (f"--save_path {xp_dir} --dataset kth --data_dir {kth_tree} "
            "--archi vgg --skipco --ny 4 --nz 4 --n_euler_steps 2 "
            "--res_gain 1.2 --obs_scale 0.2 --nt_cond 3 --nt_inf 2 --nc 1 "
            "--seq_len 6 --seq_len_test 8 --seed 5 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 2 --n_iter 4 "
            "--val_interval 2 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 2 --n_workers 2").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0
    assert (xp_dir / "model.npz").exists()
    assert (xp_dir / "model_best.npz").exists()

    topt = DotDict(xp_dir=str(xp_dir), data_dir=str(kth_tree), lpips_dir=None,
                   n_euler_steps=None, nt_cond=None, nt_gen=None, batch_size=4,
                   n_samples=2, samples_chunk=2, model_name="model.npz",
                   device=None, fvd=False, test_seed=1, fused_rollout="off")
    test_cli.main(topt)

    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (4,)   # the 4 test videos
    assert np.all(np.isfinite(results["psnr"]))
    pred = np.load(xp_dir / "random_1.npz")["samples"]
    assert pred.shape == (4, 5, 64, 64, 1)  # T_pred = 8 - nt_cond(3)
