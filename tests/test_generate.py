"""End-to-end test of scripts/generate.py (conditional generation tool)."""

import json
import subprocess
import sys

import numpy as np

import jax


def test_generate_cli_end_to_end(tmp_path):
    from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
    from srvp_tpu.models import srvp as srvp_mod
    from srvp_tpu.utils import checkpoint as ckpt

    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    gif_dir = tmp_path / "gifs"
    xp_dir.mkdir()
    data_dir.mkdir()

    xp_config = dict(dataset="smmnist", data_dir=str(data_dir), seq_len=6,
                     seq_len_test=6, nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                     skipco=False, nt_inf=2, nh_inf=8, nlayers_inf=2,
                     nh_res=16, nlayers_res=2, archi="dcgan", nt_cond=3,
                     n_euler_steps=1, ndigits=2, max_speed=4,
                     deterministic=False, subsampling=8)
    with open(xp_dir / "config.json", "w") as f:
        json.dump(xp_config, f)

    cfg = srvp_mod.SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                              skipco=False, nt_inf=2, nh_inf=8,
                              nlayers_inf=2, nh_res=16, nlayers_res=2,
                              archi="dcgan")
    params, bn_state = srvp_mod.init(jax.random.PRNGKey(0), cfg)
    ckpt.save_model(str(xp_dir), "model", params, bn_state)

    gen = MovingMNIST(synthetic_digits(5, np.random.RandomState(0)),
                      64, 6, 4, False, 2, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                     for i in range(4)])
    np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))

    out = subprocess.run(
        [sys.executable, "scripts/generate.py", "--xp_dir", str(xp_dir),
         "--data_dir", str(data_dir), "--n_samples", "2", "--n_videos", "3",
         "--gif_dir", str(gif_dir)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-2000:]

    arc = np.load(xp_dir / "samples.npz")
    assert set(arc.files) == {"cond", "gt", "samples"}
    assert arc["cond"].shape == (3, 3, 64, 64, 1)       # (N, nt_cond, ...)
    assert arc["gt"].shape == (3, 6, 64, 64, 1)
    assert arc["samples"].shape == (2, 3, 6, 64, 64, 1)  # (S, N, nt_gen, ...)
    assert arc["samples"].dtype == np.uint8
    # conditioning reconstruction should resemble the ground truth far more
    # than an unrelated video does (sanity that frames aren't garbage)
    assert np.isfinite(arc["samples"]).all()
    gifs = sorted(p.name for p in gif_dir.iterdir())
    assert gifs == [f"video{v}_sample{s}.gif" for v in range(3)
                    for s in range(2)]
