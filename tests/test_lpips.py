"""LPIPS parity test against an inline torch mirror with shared random weights."""

import numpy as np

import jax.numpy as jnp
import torch
import torch.nn.functional as F

from srvp_tpu.metrics.lpips import (
    _ALEX_CONVS, alex_lpips_apply, convert_alexnet_state_dict,
    convert_lin_state_dict)


def _torch_alex_features(sd, x):
    """torchvision-alexnet feature slices after each ReLU."""
    feats = []
    idx = [0, 3, 6, 8, 10]
    strides = [4, 1, 1, 1, 1]
    pads = [2, 2, 1, 1, 1]
    h = x
    for i, (fi, s, p) in enumerate(zip(idx, strides, pads)):
        if i in (1, 2):
            h = F.max_pool2d(h, 3, 2)
        w = torch.from_numpy(sd[f"features.{fi}.weight"])
        b = torch.from_numpy(sd[f"features.{fi}.bias"])
        h = F.relu(F.conv2d(h, w, b, stride=s, padding=p))
        feats.append(h)
    return feats


def _torch_lpips(bb_sd, lin_sd, x, y):
    shift = torch.tensor([-.030, -.088, -.188]).view(1, 3, 1, 1)
    scale = torch.tensor([.458, .448, .450]).view(1, 3, 1, 1)
    fx = _torch_alex_features(bb_sd, (x - shift) / scale)
    fy = _torch_alex_features(bb_sd, (y - shift) / scale)
    val = 0
    for i in range(5):
        nx = fx[i] / (fx[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        ny = fy[i] / (fy[i].pow(2).sum(1, keepdim=True).sqrt() + 1e-10)
        diff = (nx - ny) ** 2
        w = torch.from_numpy(lin_sd[f"lin{i}.model.1.weight"])
        val = val + F.conv2d(diff, w).mean([2, 3], keepdim=True)
    return val.flatten()


def _random_weights(seed=0):
    rng = np.random.RandomState(seed)
    bb_sd, lin_sd = {}, {}
    idx = [0, 3, 6, 8, 10]
    for i, (co, ci, k, _, _) in zip(idx, _ALEX_CONVS):
        bb_sd[f"features.{i}.weight"] = (
            rng.randn(co, ci, k, k).astype(np.float32) * 0.05)
        bb_sd[f"features.{i}.bias"] = rng.randn(co).astype(np.float32) * 0.1
    for li, c in enumerate([64, 192, 384, 256, 256]):
        lin_sd[f"lin{li}.model.1.weight"] = np.abs(
            rng.randn(1, c, 1, 1).astype(np.float32))
    return bb_sd, lin_sd


def test_lpips_matches_torch_mirror():
    bb_sd, lin_sd = _random_weights()
    params = {"convs": convert_alexnet_state_dict(bb_sd),
              "lins": convert_lin_state_dict(lin_sd)}
    rng = np.random.RandomState(1)
    x = (rng.rand(4, 3, 64, 64).astype(np.float32) * 2 - 1)
    y = np.clip(x + 0.2 * rng.randn(*x.shape).astype(np.float32), -1, 1)

    ref = _torch_lpips(bb_sd, lin_sd, torch.from_numpy(x),
                       torch.from_numpy(y)).numpy()
    ours = alex_lpips_apply(params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                            jnp.asarray(np.transpose(y, (0, 2, 3, 1))))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-3, atol=1e-5)


def test_lpips_zero_on_identical_inputs():
    bb_sd, lin_sd = _random_weights(2)
    params = {"convs": convert_alexnet_state_dict(bb_sd),
              "lins": convert_lin_state_dict(lin_sd)}
    x = jnp.asarray(np.random.RandomState(3).rand(2, 64, 64, 3)
                    .astype(np.float32))
    out = alex_lpips_apply(params, x, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_lpips_reference_golden():
    """JAX LPIPS + weight converters reproduce the REFERENCE implementation.

    Fixture frozen by scripts/make_lpips_golden.py, which runs the vendored
    reference PNetLin (/root/reference/metrics/lpips/networks_basic.py:
    scaling layer, alexnet slices, unit-normalize, lin heads, spatial
    average) on deterministic weights stored in the official state_dict key
    formats — so this fails on any key/layout bug in
    convert_alexnet_state_dict / convert_lin_state_dict, not just on math
    bugs shared with a hand-written mirror.
    """
    import os
    path = os.path.join(os.path.dirname(__file__), "golden",
                        "lpips_golden.npz")
    data = np.load(path)
    bb_sd = {k[3:]: data[k] for k in data.files if k.startswith("bb/")}
    lin_sd = {k[4:]: data[k] for k in data.files if k.startswith("lin/")}
    params = {"convs": convert_alexnet_state_dict(bb_sd),
              "lins": convert_lin_state_dict(lin_sd)}
    x = np.transpose(data["x"], (0, 2, 3, 1))
    y = np.transpose(data["y"], (0, 2, 3, 1))
    ours = alex_lpips_apply(params, jnp.asarray(x), jnp.asarray(y))
    np.testing.assert_allclose(np.asarray(ours), data["lpips"],
                               rtol=1e-4, atol=1e-6)
