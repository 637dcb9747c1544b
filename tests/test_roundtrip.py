"""Full train.py -> test.py roundtrip through the CLI surfaces (CPU, tiny)."""

import numpy as np

import test as test_cli
import train as train_cli  # noqa: F401  (imports the CLI wiring)
from srvp_tpu import args as args_mod
from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main as train_main


def test_train_then_test_roundtrip(tmp_path):
    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    data_dir.mkdir()

    # precomputed test set in the reference npz format
    gen = MovingMNIST(synthetic_digits(6, np.random.RandomState(0)),
                      64, 6, 4, False, 2, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                     for i in range(4)])
    np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))

    # ---- train via the real flag parser (reference-style invocation) ----
    argv = (f"--save_path {xp_dir} --dataset smmnist --data_dir {data_dir} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 --seed 3 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 4 --n_iter 6 "
            "--val_interval 3 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 3 --allow_synthetic "
            "--n_workers 1 --seq_len_test 6").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0
    assert (xp_dir / "config.json").exists()
    assert (xp_dir / "model.npz").exists()
    assert (xp_dir / "model_best.npz").exists()

    # ---- resume continues from the saved step ----
    opt2 = DotDict(dict(opt))
    opt2.resume = True
    opt2.n_iter = 8
    assert train_main(opt2) == 0

    # ---- evaluate via test.py using the written config.json ----
    topt = DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir), lpips_dir=None,
                   n_euler_steps=None, nt_cond=None, nt_gen=None, batch_size=4,
                   n_samples=2, samples_chunk=2, model_name="model.npz",
                   device=None, fvd=False, test_seed=1, fused_rollout="off")
    test_cli.main(topt)
    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (4,)
    assert np.all(np.isfinite(results["psnr"]))


def test_best_val_tracker_survives_resume(tmp_path):
    """model_best.npz must never be overwritten by a worse post-resume
    validation: the best-val metric is persisted in train_state.json and
    restored on --resume (a fresh tracker would treat the first
    post-resume val as a new best unconditionally)."""
    import hashlib
    import json

    xp_dir = tmp_path / "xp"
    argv = (f"--save_path {xp_dir} --dataset smmnist --data_dir {tmp_path} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 --seed 3 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 4 --n_iter 6 "
            "--val_interval 3 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 3 --allow_synthetic "
            "--n_workers 1 --seq_len_test 6").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0

    meta_path = xp_dir / "train_state.json"
    meta = json.loads(meta_path.read_text())
    assert meta.get("best_val_metric") is not None  # persisted at all

    # Tamper: pretend the pre-interruption run had an unbeatable best.
    meta["best_val_metric"] = -999.0
    meta_path.write_text(json.dumps(meta))
    best_before = hashlib.sha256((xp_dir / "model_best.npz").read_bytes())

    opt2 = DotDict(dict(opt))
    opt2.resume = True
    opt2.n_iter = 9  # one more val at step 9, which cannot beat -999
    assert train_main(opt2) == 0

    meta2 = json.loads(meta_path.read_text())
    assert meta2["best_val_metric"] == -999.0  # restored, not reset
    best_after = hashlib.sha256((xp_dir / "model_best.npz").read_bytes())
    assert best_before.hexdigest() == best_after.hexdigest()


def test_steps_per_dispatch_cli_matches_single_dispatch(tmp_path):
    """--steps_per_dispatch 2 through the real CLI reproduces the spd=1
    run (same data order, same val/checkpoint cadence; float drift only
    from XLA fusing the scan body differently). Also exercises the
    unaligned-resume catch-up: resuming at step 3 runs singles until the
    window grid, then a full window, then the ragged tail."""
    def run(spd, n_iter, save, resume=False):
        argv = (f"--save_path {save} --dataset smmnist --data_dir {save} "
                "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 "
                "--seed 5 --nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 "
                "--nh_res 16 --nlayers_res 2 --batch_size 8 "
                "--batch_size_test 4 --val_interval 6 --n_iter_test 1 "
                "--n_samples_test 2 --val_samples_chunk 2 --log_interval 6 "
                "--allow_synthetic --n_workers 1 "
                f"--n_iter {n_iter} --steps_per_dispatch {spd}"
                + (" --resume" if resume else "")).split()
        opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
        assert train_main(opt) == 0
        return np.load(save / "model.npz")

    ref = run(1, 7, tmp_path / "a")
    got = run(2, 7, tmp_path / "b")
    assert set(ref.files) == set(got.files)
    for k in ref.files:
        np.testing.assert_allclose(ref[k], got[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)

    # unaligned resume: 3 steps at spd=1, then continue to 7 at spd=2
    run(1, 3, tmp_path / "c")
    got2 = run(2, 7, tmp_path / "c", resume=True)
    for k in ref.files:
        np.testing.assert_allclose(ref[k], got2[k], rtol=2e-5, atol=1e-6,
                                   err_msg=k)


def test_train_then_test_roundtrip_vgg_skipco_kth_hparams(tmp_path):
    """Same CLI roundtrip at the KTH recipe's structural hyperparameters
    (reference README training section: vgg, skipco, ny=nz=50,
    n_euler_steps=2) with conv widths shrunk for CPU. Covers the
    skip-connection decoder and the oversampled Euler rollout end to end,
    including checkpoint save/load of the vgg+skipco parameter tree."""
    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    data_dir.mkdir()

    gen = MovingMNIST(synthetic_digits(6, np.random.RandomState(0)),
                      64, 8, 4, False, 2, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                     for i in range(4)])
    np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))

    argv = (f"--save_path {xp_dir} --dataset smmnist --data_dir {data_dir} "
            "--archi vgg --skipco --ny 50 --nz 50 --n_euler_steps 2 "
            "--nt_cond 4 --nt_inf 3 --nc 1 --seq_len 8 --seed 3 "
            "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 4 --n_iter 4 "
            "--val_interval 2 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 2 --allow_synthetic "
            "--n_workers 1 --seq_len_test 8").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0

    topt = DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir), lpips_dir=None,
                   n_euler_steps=None, nt_cond=None, nt_gen=None, batch_size=4,
                   n_samples=2, samples_chunk=2, model_name="model.npz",
                   device=None, fvd=False, test_seed=1, fused_rollout="off")
    test_cli.main(topt)
    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (4,)
    assert np.all(np.isfinite(results["psnr"]))
