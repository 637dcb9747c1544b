"""BAIR train.py -> test.py CLI roundtrip on a synthetic PNG tree.

Complements the KTH CLI roundtrip with the paths unique to BAIR
(/root/reference/data/bair.py + README BAIR recipe): 3-channel frames
through the whole stack (stem conv, decoder output, uint8 artifacts), a
PNG-directory TEST fold (KTH's test fold is an npz), and the fixed-start
t0=0 eval windows vs random-start training windows.
"""

import numpy as np
import pytest
from PIL import Image

import test as test_cli
from srvp_tpu import args as args_mod
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main as train_main


@pytest.fixture(scope="module")
def bair_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("bair_cli")
    rng = np.random.RandomState(11)
    for fold, n_vids in [("train", 12), ("test", 4)]:
        for v in range(n_vids):
            d = (root / "processed_data" / fold / f"traj_{v // 4}"
                 / f"{v % 4}")
            d.mkdir(parents=True)
            for t in range(30):   # BAIR videos are exactly 30 frames
                img = rng.randint(0, 255, (64, 64, 3)).astype(np.uint8)
                Image.fromarray(img).save(d / f"{t:02d}.png")
    return root


def test_bair_train_then_test_roundtrip(bair_tree, tmp_path):
    xp_dir = tmp_path / "xp"

    # the reference BAIR recipe's structural flags at tiny widths
    argv = (f"--save_path {xp_dir} --dataset bair --data_dir {bair_tree} "
            "--archi vgg --skipco --ny 4 --nz 4 --beta_z 2 --nt_cond 2 "
            "--nt_inf 2 --nc 3 --seq_len 5 --seq_len_test 10 --seed 9 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 2 --n_iter 4 "
            "--val_interval 2 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 2 --n_workers 2").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0

    topt = DotDict(xp_dir=str(xp_dir), data_dir=str(bair_tree),
                   lpips_dir=None, n_euler_steps=None, nt_cond=None,
                   nt_gen=None, batch_size=4, n_samples=2, samples_chunk=2,
                   model_name="model.npz", device=None, fvd=False,
                   test_seed=1, fused_rollout="off")
    test_cli.main(topt)

    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (4,)
    assert np.all(np.isfinite(results["psnr"]))
    pred = np.load(xp_dir / "random_1.npz")["samples"]
    assert pred.shape == (4, 8, 64, 64, 3)  # T_pred = 10 - nt_cond(2), RGB
