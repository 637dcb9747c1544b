"""Serving export (srvp_tpu/export.py): AOT StableHLO artifacts.

Locks the serving contract the reference has no equivalent of
(/root/reference/test.py only re-runs the torch model in-process):
roundtrip bit-parity with the live model, batch polymorphism, format
validation, and the CLI surface over a real trained xp dir.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srvp_tpu import export as ex
from srvp_tpu.models.srvp import SRVPConfig, forward, init

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tiny(archi="dcgan", skipco=False):
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=16, ny=4, nz=4, skipco=skipco,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi=archi)
    params, bn = init(jax.random.PRNGKey(0), cfg)
    return cfg, params, bn


@pytest.mark.parametrize("archi,skipco", [("dcgan", False), ("vgg", True)])
def test_export_roundtrip_bit_exact(tmp_path, archi, skipco):
    """Deserialized artifact == live forward, bit for bit (same platform,
    fp32), for both encoder families incl. the skip-connection path."""
    cfg, params, bn = _tiny(archi, skipco)
    blob = ex.export_serving(cfg, params, bn, nt_cond=3, nt_gen=6,
                             oversampling=2, compute_dtype=jnp.float32,
                             platforms=("cpu",))
    path = str(tmp_path / "m.srvpexp")
    ex.save_serving(path, blob)
    fn, hdr = ex.load_serving(path)
    assert hdr["nt_cond"] == 3 and hdr["nt_gen"] == 6
    assert hdr["batch"] == "symbolic"

    x = (np.random.RandomState(1).rand(3, 4, 64, 64, 1) * 255).astype(np.uint8)
    got = np.asarray(fn(x, 7))
    ref = forward(cfg, params, bn, jnp.asarray(x, jnp.float32) / 255.0, 6,
                  oversampling=2, rng=jax.random.PRNGKey(7), train=False,
                  compute_dtype=jnp.float32).x_
    ref = np.asarray(jnp.round(jnp.clip(ref.astype(jnp.float32), 0, 1)
                               * 255).astype(jnp.uint8))
    np.testing.assert_array_equal(got, ref)


def test_export_batch_polymorphic(tmp_path):
    """One artifact serves any batch size; different seeds give different
    samples, same seed reproduces."""
    cfg, params, bn = _tiny()
    blob = ex.export_serving(cfg, params, bn, nt_cond=3, nt_gen=6,
                             compute_dtype=jnp.float32, platforms=("cpu",))
    path = str(tmp_path / "m.srvpexp")
    ex.save_serving(path, blob)
    fn, _ = ex.load_serving(path)
    rs = np.random.RandomState(0)
    for b in (1, 3, 8):
        x = (rs.rand(3, b, 64, 64, 1) * 255).astype(np.uint8)
        out = np.asarray(fn(x, 5))
        assert out.shape == (6, b, 64, 64, 1) and out.dtype == np.uint8
    x = (rs.rand(3, 2, 64, 64, 1) * 255).astype(np.uint8)
    a, b_, c = (np.asarray(fn(x, s)) for s in (1, 1, 2))
    np.testing.assert_array_equal(a, b_)            # deterministic per seed
    assert np.any(a[4:] != c[4:])                   # stochastic across seeds


def test_export_dual_platform_header(tmp_path):
    """Default export lowers for tpu AND cpu; the artifact still executes
    on this (cpu) host."""
    cfg, params, bn = _tiny()
    blob = ex.export_serving(cfg, params, bn, nt_cond=2, nt_gen=4)
    path = str(tmp_path / "m.srvpexp")
    ex.save_serving(path, blob)
    fn, hdr = ex.load_serving(path)
    assert hdr["platforms"] == ["tpu", "cpu"]
    assert hdr["compute_dtype"] == "bfloat16"
    x = np.zeros((2, 2, 64, 64, 1), dtype=np.uint8)
    assert np.asarray(fn(x, 0)).shape == (4, 2, 64, 64, 1)


def test_export_pinned_batch(tmp_path):
    cfg, params, bn = _tiny()
    blob = ex.export_serving(cfg, params, bn, nt_cond=2, nt_gen=4,
                             compute_dtype=jnp.float32, platforms=("cpu",),
                             batch_size=3)
    path = str(tmp_path / "m.srvpexp")
    ex.save_serving(path, blob)
    fn, hdr = ex.load_serving(path)
    assert hdr["batch"] == 3
    x = np.zeros((2, 3, 64, 64, 1), dtype=np.uint8)
    assert np.asarray(fn(x, 0)).shape == (4, 3, 64, 64, 1)
    with pytest.raises(Exception):  # wrong batch must be rejected, not bent
        fn(np.zeros((2, 2, 64, 64, 1), dtype=np.uint8), 0)


def test_load_rejects_non_artifact(tmp_path):
    bad = tmp_path / "bad.srvpexp"
    bad.write_bytes(b"not an export at all")
    with pytest.raises(ValueError, match="bad magic"):
        ex.load_serving(str(bad))


def test_export_cli_over_trained_xp(tmp_path):
    """scripts/export_serving.py over a real (tiny) trained xp dir: the
    production flow checkpoint -> artifact -> selfcheck."""
    from srvp_tpu import args as args_mod
    from srvp_tpu.helper import DotDict
    from srvp_tpu.train_main import main as train_main

    xp = tmp_path / "xp"
    argv = (f"--save_path {xp} --dataset smmnist --data_dir {tmp_path} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 "
            "--seed 3 --nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 4 --n_iter 3 "
            "--val_interval 3 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 3 --allow_synthetic "
            "--n_workers 1 --seq_len_test 6").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "export_serving.py"),
         "--xp_dir", str(xp), "--model_name", "model.npz",
         "--platforms", "cpu", "--selfcheck"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "Selfcheck ok" in r.stdout
    assert os.path.exists(xp / "serving.srvpexp")
