"""End-to-end test of scripts/swap.py (content/dynamics swap grid).

Locks the tool's core contract: the (content i, dynamics i) diagonal of the
swap grid reproduces the model's ordinary prediction (same RNG derivation
as srvp.forward), and off-diagonal cells actually mix sources (changing
the content row or the dynamics column changes the output).
"""

import json
import subprocess
import sys

import numpy as np

import jax

CFG = dict(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=True, nt_inf=2,
           nh_inf=8, nlayers_inf=2, nh_res=16, nlayers_res=2, archi="dcgan")


def _make_xp(tmp_path):
    from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
    from srvp_tpu.models import srvp as srvp_mod
    from srvp_tpu.utils import checkpoint as ckpt

    xp_dir = tmp_path / "xp"
    data_dir = tmp_path / "data"
    xp_dir.mkdir()
    data_dir.mkdir()

    xp_config = dict(dataset="smmnist", data_dir=str(data_dir), seq_len=6,
                     seq_len_test=6, nt_cond=3, n_euler_steps=1, ndigits=2,
                     max_speed=4, deterministic=False, subsampling=8, **CFG)
    with open(xp_dir / "config.json", "w") as f:
        json.dump(xp_config, f)

    cfg = srvp_mod.SRVPConfig(**CFG)
    params, bn_state = srvp_mod.init(jax.random.PRNGKey(3), cfg)
    # A fresh init decodes every pixel to sigmoid(~0) == 127, which would
    # blind the "off-diagonal cells differ" assertions; 3x-scaled weights
    # desaturate the decoder (u8 std ~96) while staying finite.
    params = jax.tree.map(lambda a: a * 3.0, params)
    ckpt.save_model(str(xp_dir), "model", params, bn_state)

    gen = MovingMNIST(synthetic_digits(5, np.random.RandomState(0)),
                      64, 6, 4, False, 2, True)
    vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                     for i in range(4)])
    np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                        sequences=np.transpose(vids, (1, 0, 2, 3)))
    return xp_dir, data_dir, cfg, params, bn_state, vids


def test_swap_cli_grid_and_diagonal(tmp_path):
    from srvp_tpu.models import srvp as srvp_mod

    xp_dir, data_dir, cfg, params, bn_state, vids = _make_xp(tmp_path)
    gif = tmp_path / "grid.gif"

    out = subprocess.run(
        [sys.executable, "scripts/swap.py", "--xp_dir", str(xp_dir),
         "--data_dir", str(data_dir), "--n_videos", "3", "--seed", "7",
         "--gif", str(gif)],
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root"})
    assert out.returncode == 0, out.stderr[-2000:]

    arc = np.load(xp_dir / "swap.npz")
    assert set(arc.files) == {"cond", "gt", "grid"}
    assert arc["cond"].shape == (3, 3, 64, 64, 1)
    assert arc["gt"].shape == (3, 6, 64, 64, 1)
    grid = arc["grid"]
    assert grid.shape == (3, 3, 6, 64, 64, 1) and grid.dtype == np.uint8
    assert gif.exists() and gif.stat().st_size > 0

    # Diagonal == the ordinary prediction: recompute srvp.forward with the
    # same base key the CLI used (PRNGKey(7); swap.py mirrors forward's
    # 4-way split). u8 truncation can flip a bin on ~1e-7 float noise from
    # the different decode batch composition, so allow |diff| <= 1 gray
    # level on a vanishing fraction of pixels.
    x = np.transpose(vids[:3], (1, 0, 2, 3))[..., None].astype(np.float32)
    x_cond = x[:3] / 255.0
    fwd = srvp_mod.forward(cfg, params, bn_state, x_cond, 6,
                           oversampling=1, rng=jax.random.PRNGKey(7),
                           train=False)
    ref = (np.clip(np.asarray(fwd.x_), 0, 1) * 255).astype(np.uint8)
    ref = np.transpose(ref, (1, 0, 2, 3, 4))             # (N, T, H, W, C)
    diag = grid[np.arange(3), np.arange(3)]
    diff = np.abs(diag.astype(int) - ref.astype(int))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3

    # Off-diagonal cells mix sources: changing the content row or the
    # dynamics column must change the output.
    assert np.any(grid[0, 1] != grid[0, 0])   # same content, other dynamics
    assert np.any(grid[1, 0] != grid[0, 0])   # other content, same dynamics
    assert np.isfinite(grid).all()
