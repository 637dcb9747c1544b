"""End-to-end `test.py --lpips_dir` CLI coverage with synthetic weights.

The LPIPS network, converters, and golden numerics are covered by
tests/test_lpips.py; this drives the remaining integration seam — test.py
wiring make_video_lpips into the jitted sampler, the `lpips` metric through
the on-device best/worst selection (a LOWER_BETTER metric, unlike
psnr/ssim), and the lpips_{best,worst} artifact archives (reference
/root/reference/test.py:172,249-277).
"""

import numpy as np

import torch

from srvp_tpu.helper import DotDict
from tests.test_fvd_cli import _write_xp


def _write_lpips_dir(tmp_path):
    """Random spec-shaped torch .pth files in the on-disk layout
    load_lpips_params expects (alex.pth linear heads + alexnet backbone)."""
    from tests.test_lpips import _random_weights

    lpips_dir = tmp_path / "lpips"
    lpips_dir.mkdir()
    bb_sd, lin_sd = _random_weights(seed=3)
    torch.save({k: torch.from_numpy(v) for k, v in bb_sd.items()},
               lpips_dir / "alexnet.pth")
    torch.save({k: torch.from_numpy(v) for k, v in lin_sd.items()},
               lpips_dir / "alex.pth")
    return lpips_dir


def test_lpips_cli_end_to_end(tmp_path):
    import test as test_cli

    xp_dir, data_dir = _write_xp(tmp_path, seq_len=6, nt_cond=3)
    lpips_dir = _write_lpips_dir(tmp_path)

    opt = DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir),
                  lpips_dir=str(lpips_dir), n_euler_steps=None, nt_cond=None,
                  nt_gen=None, batch_size=16, n_samples=4, samples_chunk=2,
                  model_name="model.npz", device=None, fvd=False, test_seed=1,
                  fused_rollout="off")
    test_cli.main(opt)

    results = np.load(xp_dir / "results.npz")
    assert set(results.files) == {"psnr", "ssim", "lpips"}
    assert results["lpips"].shape == (16,)
    assert np.all(np.isfinite(results["lpips"]))
    assert np.all(results["lpips"] >= 0.0)

    best = np.load(xp_dir / "lpips_best.npz")["samples"]
    worst = np.load(xp_dir / "lpips_worst.npz")["samples"]
    assert best.shape == (16, 3, 64, 64, 1)  # (N, T_pred, H, W, C)
    assert worst.shape == best.shape
    assert best.dtype == np.uint8
    # (best/worst FRAMES can coincide here: an untrained model decodes
    # near-identical samples that quantize to the same uint8 video)
