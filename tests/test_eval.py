"""Evaluation tests: SSIM torch-parity and end-to-end test.py CLI."""

import json
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from srvp_tpu.metrics.ssim import gaussian_kernel, ssim, video_ssim

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class TestSSIM:
    def _torch_ssim(self, x, y, max_val=1.0, size=11, sigma=1.5, k1=0.01, k2=0.03):
        """Inline torch mirror of the reference SSIM (metrics/ssim.py:81-111)."""
        c = x.shape[1]
        coords = torch.tensor([(i - (size - 1.) / 2.) for i in range(size)])
        grid = (-coords ** 2 / (2 * sigma ** 2)).view(1, -1) + \
               (-coords ** 2 / (2 * sigma ** 2)).view(-1, 1)
        kernel = grid.view(1, -1).softmax(-1).view(1, 1, size, size)
        kernel = kernel.expand(c, 1, size, size).contiguous()
        c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
        mu1 = F.conv2d(x, kernel, groups=c)
        mu2 = F.conv2d(y, kernel, groups=c)
        s1 = F.conv2d(x * x, kernel, groups=c) - mu1 ** 2
        s2 = F.conv2d(y * y, kernel, groups=c) - mu2 ** 2
        s12 = F.conv2d(x * y, kernel, groups=c) - mu1 * mu2
        return ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / \
               ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2))

    def test_kernel_matches_torch_softmax_trick(self):
        size, sigma = 11, 1.5
        coords = torch.tensor([(i - (size - 1.) / 2.) for i in range(size)])
        grid = (-coords ** 2 / (2 * sigma ** 2)).view(1, -1) + \
               (-coords ** 2 / (2 * sigma ** 2)).view(-1, 1)
        ref = grid.view(1, -1).softmax(-1).view(size, size).numpy()
        ours = np.asarray(gaussian_kernel(size, sigma, 1))[:, :, 0, 0]
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    @pytest.mark.parametrize("c", [1, 3])
    def test_ssim_map_matches_torch(self, c):
        rng = np.random.RandomState(0)
        x = rng.rand(4, c, 32, 32).astype(np.float32)
        y = np.clip(x + 0.1 * rng.randn(4, c, 32, 32).astype(np.float32), 0, 1)
        ref = self._torch_ssim(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        ours = ssim(jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
        np.testing.assert_allclose(np.transpose(np.asarray(ours), (0, 3, 1, 2)),
                                   ref, rtol=1e-4, atol=1e-5)

    def test_video_ssim_identity(self):
        x = jnp.asarray(np.random.RandomState(1).rand(3, 2, 32, 32, 1)
                        .astype(np.float32))
        out = video_ssim(x, x)
        assert out.shape == (3, 2, 1)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-4)


class TestTestCLI:
    def test_end_to_end(self, tmp_path):
        from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
        from srvp_tpu.helper import DotDict
        from srvp_tpu.models import srvp as srvp_mod
        from srvp_tpu.utils import checkpoint as ckpt
        import test as test_cli

        xp_dir = tmp_path / "xp"
        data_dir = tmp_path / "data"
        xp_dir.mkdir()
        data_dir.mkdir()

        # training config as train_main would have written it
        xp_config = dict(dataset="smmnist", data_dir=str(data_dir), seq_len=6,
                         seq_len_test=6, nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                         skipco=False, nt_inf=2, nh_inf=8, nlayers_inf=2,
                         nh_res=16, nlayers_res=2, archi="dcgan", nt_cond=3,
                         n_euler_steps=1, ndigits=2, max_speed=4,
                         deterministic=False, subsampling=8)
        with open(xp_dir / "config.json", "w") as f:
            json.dump(xp_config, f)

        # model snapshot
        cfg = srvp_mod.SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4,
                                  skipco=False, nt_inf=2, nh_inf=8,
                                  nlayers_inf=2, nh_res=16, nlayers_res=2,
                                  archi="dcgan")
        params, bn_state = srvp_mod.init(jax.random.PRNGKey(0), cfg)
        ckpt.save_model(str(xp_dir), "model", params, bn_state)

        # tiny precomputed test set in the reference npz format
        gen = MovingMNIST(synthetic_digits(5, np.random.RandomState(0)),
                          64, 6, 4, False, 2, True)
        vids = np.stack([gen.get_item(0, np.random.RandomState(i))
                         for i in range(5)])           # (N, T, H, W)
        np.savez_compressed(data_dir / "smmnist_test_2digits_64.npz",
                            sequences=np.transpose(vids, (1, 0, 2, 3)))

        opt = DotDict(xp_dir=str(xp_dir), data_dir=str(data_dir),
                      lpips_dir=None, n_euler_steps=None, nt_cond=None,
                      nt_gen=None, batch_size=5, n_samples=4, samples_chunk=2,
                      model_name="model.npz", device=None, fvd=False,
                      test_seed=1)
        test_cli.main(opt)

        results = np.load(xp_dir / "results.npz")
        assert set(results.files) == {"psnr", "ssim"}
        assert results["psnr"].shape == (5,)
        assert np.all(np.isfinite(results["psnr"]))
        for name in ["random_1", "cond_rec", "psnr_best", "psnr_worst",
                     "ssim_best", "ssim_worst"]:
            arc = np.load(xp_dir / f"{name}.npz")["samples"]
            assert arc.dtype == np.uint8
            if name == "cond_rec":
                assert arc.shape == (5, 3, 64, 64, 1)   # (N, T_cond, H, W, C)
            else:
                assert arc.shape == (5, 3, 64, 64, 1)   # T_pred = 6 - 3

        # best-of-N invariant: best psnr >= worst psnr per video
        best = np.load(xp_dir / "psnr_best.npz")["samples"]
        worst = np.load(xp_dir / "psnr_worst.npz")["samples"]
        assert best.shape == worst.shape
