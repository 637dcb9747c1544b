"""End-to-end `test.py --fvd` CLI coverage with synthetic I3D weights.

The FVD scoring math, the I3D network, the chunk/pad protocol and the
weight converter are each unit-tested elsewhere; what was never exercised
is test.py main()'s FVD branch itself — the weights preflight check, the
cond+random_1 vs cond+gt video assembly, and the fvd() call
(reference /root/reference/test.py:295-302). This drives that branch
through the CLI surface using a spec-shaped random-weight npz (the real
kinetics-400 weights require network access; scripts/convert_i3d.py).
"""

import json
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from convert_i3d import expected_variable_specs  # noqa: E402
from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits  # noqa: E402
from srvp_tpu.helper import DotDict  # noqa: E402

N_VIDEOS = 16   # metrics/fvd.py CHUNK: the protocol's minimum video count
SEQ_LEN = 12
NT_COND = 3


def _write_xp(tmp_path, seq_len, nt_cond):
    """Tiny trained-model fixture: config.json + model.npz + test-set npz."""
    from srvp_tpu.models import srvp as srvp_mod
    from srvp_tpu.utils import checkpoint as ckpt

    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    xp_dir.mkdir()
    data_dir.mkdir()
    xp_config = dict(dataset="smmnist", data_dir=str(data_dir),
                     seq_len=seq_len, seq_len_test=seq_len, nx=64, nc=1, nf=4,
                     nhx=8, ny=4, nz=4, skipco=False, nt_inf=2, nh_inf=8,
                     nlayers_inf=2, nh_res=16, nlayers_res=2, archi="dcgan",
                     nt_cond=nt_cond, n_euler_steps=1, ndigits=2, max_speed=4,
                     deterministic=False, subsampling=8)
    with open(xp_dir / "config.json", "w") as f:
        json.dump(xp_config, f)
    cfg = srvp_mod.SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                              skipco=False, nt_inf=2, nh_inf=8, nlayers_inf=2,
                              nh_res=16, nlayers_res=2, archi="dcgan")
    params, bn_state = srvp_mod.init(jax.random.PRNGKey(0), cfg)
    ckpt.save_model(str(xp_dir), "model", params, bn_state)

    gen = MovingMNIST(synthetic_digits(8, np.random.RandomState(0)),
                      64, seq_len, 4, False, 2, True)
    vids = np.stack([gen.get_item(i % 8, np.random.RandomState(i))
                     for i in range(N_VIDEOS)])        # (N, T, H, W)
    np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))
    return xp_dir, data_dir


def _test_opt(xp_dir, data_dir, fvd):
    return DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir), lpips_dir=None,
                   n_euler_steps=None, nt_cond=None, nt_gen=None,
                   batch_size=N_VIDEOS, n_samples=2, samples_chunk=2,
                   model_name="model.npz", device=None, fvd=fvd, test_seed=1,
                   fused_rollout="off")


def _synthetic_i3d_npz(path):
    """npz with the exact TF-Hub variable paths/shapes scripts/convert_i3d.py
    harvests (random values; moving variances kept positive)."""
    rng = np.random.RandomState(0)
    arrays = {}
    for var_path, shape in expected_variable_specs():
        if var_path.endswith("moving_variance"):
            arrays[var_path] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        else:
            arrays[var_path] = rng.uniform(-0.05, 0.05, shape).astype(np.float32)
    np.savez_compressed(path, **arrays)


def test_fvd_preflight_fails_fast_without_weights(tmp_path, monkeypatch):
    """--fvd with no I3D weights must fail BEFORE the sampling loop."""
    import test as test_cli

    xp_dir, data_dir = _write_xp(tmp_path, seq_len=6, nt_cond=3)
    monkeypatch.setenv("SRVP_TPU_I3D_WEIGHTS",
                       str(tmp_path / "definitely_absent.npz"))
    with pytest.raises(FileNotFoundError, match="I3D"):
        test_cli.main(_test_opt(xp_dir, data_dir, fvd=True))
    # preflight means no artifacts were produced
    assert not (xp_dir / "results.npz").exists()


@pytest.mark.slow
def test_fvd_cli_end_to_end(tmp_path, monkeypatch, capsys):
    """Full test.py run with --fvd: 16 videos, synthetic I3D weights."""
    import test as test_cli

    xp_dir, data_dir = _write_xp(tmp_path, SEQ_LEN, NT_COND)
    i3d_path = tmp_path / "i3d.npz"
    _synthetic_i3d_npz(i3d_path)
    monkeypatch.setenv("SRVP_TPU_I3D_WEIGHTS", str(i3d_path))

    test_cli.main(_test_opt(xp_dir, data_dir, fvd=True))

    out = capsys.readouterr().out
    fvd_lines = [ln for ln in out.splitlines() if ln.startswith("FVD")]
    assert len(fvd_lines) == 1, out
    fvd_value = float(fvd_lines[0].split()[1])
    assert np.isfinite(fvd_value)
    # generated videos differ from ground truth, so the distance is > 0
    assert fvd_value > 0.0
    results = np.load(xp_dir / "results.npz")
    assert results["psnr"].shape == (N_VIDEOS,)
