"""Deterministic-MMNIST long-horizon protocol: 100-frame rollouts, 1 sample
(reference README.md:155-157: --n_samples 1 --nt_gen 100)."""

import json

import numpy as np

from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
from srvp_tpu.helper import DotDict


def test_test_cli_100_frames_single_sample(tmp_path):
    import jax
    import test as test_cli
    from srvp_tpu.models import srvp as srvp_mod
    from srvp_tpu.utils import checkpoint as ckpt

    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    xp_dir.mkdir()
    data_dir.mkdir()

    xp_config = dict(dataset="smmnist", data_dir=str(data_dir), seq_len=100,
                     seq_len_test=100, nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                     skipco=False, nt_inf=2, nh_inf=8, nlayers_inf=2,
                     nh_res=16, nlayers_res=2, archi="dcgan", nt_cond=5,
                     n_euler_steps=1, ndigits=2, max_speed=4,
                     deterministic=True, subsampling=8)
    with open(xp_dir / "config.json", "w") as f:
        json.dump(xp_config, f)

    cfg = srvp_mod.SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                              skipco=False, nt_inf=2, nh_inf=8, nlayers_inf=2,
                              nh_res=16, nlayers_res=2, archi="dcgan")
    params, bn_state = srvp_mod.init(jax.random.PRNGKey(0), cfg)
    ckpt.save_model(str(xp_dir), "model", params, bn_state)

    gen = MovingMNIST(synthetic_digits(5, np.random.RandomState(0)),
                      64, 100, 4, True, 2, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                     for i in range(3)])
    np.savez_compressed(data_dir / "mmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))

    opt = DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir), lpips_dir=None,
                  n_euler_steps=None, nt_cond=None, nt_gen=100, batch_size=3,
                  n_samples=1, samples_chunk=10, model_name="model.npz",
                  device=None, fvd=False, test_seed=1, fused_rollout="off")
    test_cli.main(opt)

    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (3,)
    pred = np.load(xp_dir / "random_1.npz")["samples"]
    assert pred.shape == (3, 95, 64, 64, 1)  # 100 - 5 cond frames
    # n_samples=1: best == worst == the single sample
    best = np.load(xp_dir / "psnr_best.npz")["samples"]
    worst = np.load(xp_dir / "psnr_worst.npz")["samples"]
    np.testing.assert_array_equal(best, worst)
    np.testing.assert_array_equal(best, pred)
