"""Human3.6M train.py -> test.py CLI roundtrip on synthetic per-video npz's.

Completes the per-dataset CLI coverage (smmnist/kth/bair elsewhere) with the
paths unique to Human3.6M (/root/reference/data/human.py + README recipe):
whole-video npz archives held in RAM, stride-`subsampling` temporal windows
of (seq_len-1)*subsampling + 1 original frames, and the
test_set_{seq_len}_{subsampling} directory-of-npz test fold.
"""

import numpy as np
import pytest

import test as test_cli
from srvp_tpu import args as args_mod
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main as train_main

SEQ_LEN, SEQ_LEN_TEST, SUB = 4, 6, 2


@pytest.fixture(scope="module")
def human_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("human_cli")
    rng = np.random.RandomState(13)
    (root / "train").mkdir()
    for v in range(6):
        frames = rng.randint(0, 255, (20, 64, 64, 3)).astype(np.uint8)
        np.savez_compressed(root / "train" / f"S1_Walking_{v}.npz",
                            image=frames, filename=f"S1_Walking_{v}",
                            subject=1)
    test_dir = root / f"test_set_{SEQ_LEN_TEST}_{SUB}"
    test_dir.mkdir()
    actual = (SEQ_LEN_TEST - 1) * SUB + 1
    for v in range(4):
        frames = rng.randint(0, 255, (actual, 64, 64, 3)).astype(np.uint8)
        np.savez_compressed(test_dir / f"clip_{v}.npz", image=frames,
                            filename=f"clip_{v}", subject=9)
    return root


def test_human_train_then_test_roundtrip(human_tree, tmp_path):
    xp_dir = tmp_path / "xp"

    argv = (f"--save_path {xp_dir} --dataset human --data_dir {human_tree} "
            "--archi vgg --skipco --ny 4 --nz 4 --nt_cond 2 --nt_inf 2 "
            f"--nc 3 --seq_len {SEQ_LEN} --seq_len_test {SEQ_LEN_TEST} "
            f"--subsampling {SUB} --seed 17 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 2 --n_iter 4 "
            "--val_interval 2 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 2 --n_workers 2").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0

    topt = DotDict(xp_dir=str(xp_dir), data_dir=str(human_tree),
                   lpips_dir=None, n_euler_steps=None, nt_cond=None,
                   nt_gen=None, batch_size=4, n_samples=2, samples_chunk=2,
                   model_name="model.npz", device=None, fvd=False,
                   test_seed=1, fused_rollout="off")
    test_cli.main(topt)

    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (4,)
    assert np.all(np.isfinite(results["psnr"]))
    pred = np.load(xp_dir / "random_1.npz")["samples"]
    assert pred.shape == (4, 4, 64, 64, 3)  # T_pred = 6 - nt_cond(2), RGB
