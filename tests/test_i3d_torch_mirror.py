"""I3D architecture parity: JAX implementation vs an independent torch mirror.

The kinetics-400 I3D weights are not reachable offline, so full real-weight
validation is impossible in this environment (scripts/convert_i3d.py covers
that when tfhub access exists). This test instead cross-checks the NETWORK
itself: a torch mirror of Inception-v1-inflated-3D — written against the
published architecture (Carreira & Zisserman 2017; TF-Hub
deepmind/i3d-kinetics-400/1, used by /root/reference/metrics/fvd/fvd.py:89-126)
— shares random weights with srvp_tpu.metrics.i3d and must produce the same
400-way time-averaged logits. This catches kernel-layout transpositions,
TF-'SAME' asymmetric padding mistakes (conv AND pool, including the -inf pad
of max-pools), BN formula drift, and branch-concat order bugs that
shape-only tests cannot see.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from srvp_tpu.metrics.i3d import (
    _BRANCH_PATHS, _MIXED, i3d_apply, i3d_random_params)


def _tf_same_pad(size, stride, k):
    out = -(-size // stride)
    total = max((out - 1) * stride + k - size, 0)
    lo = total // 2
    return lo, total - lo


def _pad_same_3d(x, k, stride, value=0.0):
    """x: (N, C, T, H, W); TF-SAME asymmetric padding (low <= high)."""
    pads = []
    for dim, kk, ss in zip(x.shape[-1:-4:-1], k[::-1], stride[::-1]):
        pads.extend(_tf_same_pad(dim, ss, kk))
    return F.pad(x, pads, value=value)


def _unit3d_torch(p, x, stride=(1, 1, 1), relu=True, bn=True):
    w = torch.from_numpy(np.transpose(np.asarray(p["w"]), (4, 3, 0, 1, 2)))
    k = w.shape[2:]
    x = _pad_same_3d(x, k, stride)
    y = F.conv3d(x, w, stride=stride)
    if "b" in p:
        y = y + torch.from_numpy(np.asarray(p["b"])).view(1, -1, 1, 1, 1)
    if bn:
        mean = torch.from_numpy(np.asarray(p["mean"])).view(1, -1, 1, 1, 1)
        var = torch.from_numpy(np.asarray(p["var"])).view(1, -1, 1, 1, 1)
        beta = torch.from_numpy(np.asarray(p["beta"])).view(1, -1, 1, 1, 1)
        y = (y - mean) * torch.rsqrt(var + 1e-3) + beta
    if relu:
        y = F.relu(y)
    return y


def _max_pool3d_torch(x, window, stride):
    x = _pad_same_3d(x, window, stride, value=float("-inf"))
    return F.max_pool3d(x, window, stride)


def _mixed_torch(p, x):
    b0 = _unit3d_torch(p["b0"], x)
    b1 = _unit3d_torch(p["b1b"], _unit3d_torch(p["b1a"], x))
    b2 = _unit3d_torch(p["b2b"], _unit3d_torch(p["b2a"], x))
    b3 = _unit3d_torch(p["b3"], _max_pool3d_torch(x, (3, 3, 3), (1, 1, 1)))
    return torch.cat([b0, b1, b2, b3], dim=1)


def _i3d_torch(params, videos):
    """videos: (N, T, H, W, 3) -> (N, 400); mirrors i3d_apply layer by layer."""
    h = torch.from_numpy(np.transpose(videos, (0, 4, 1, 2, 3))).contiguous()
    h = _unit3d_torch(params["Conv3d_1a_7x7"], h, stride=(2, 2, 2))
    h = _max_pool3d_torch(h, (1, 3, 3), (1, 2, 2))
    h = _unit3d_torch(params["Conv3d_2b_1x1"], h)
    h = _unit3d_torch(params["Conv3d_2c_3x3"], h)
    h = _max_pool3d_torch(h, (1, 3, 3), (1, 2, 2))
    h = _mixed_torch(params["Mixed_3b"], h)
    h = _mixed_torch(params["Mixed_3c"], h)
    h = _max_pool3d_torch(h, (3, 3, 3), (2, 2, 2))
    for name in ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"]:
        h = _mixed_torch(params[name], h)
    h = _max_pool3d_torch(h, (2, 2, 2), (2, 2, 2))
    h = _mixed_torch(params["Mixed_5b"], h)
    h = _mixed_torch(params["Mixed_5c"], h)
    h = F.avg_pool3d(h, (2, 7, 7), stride=1)
    logits = _unit3d_torch(params["Logits"], h, relu=False, bn=False)
    return logits[:, :, :, 0, 0].mean(dim=2)


@pytest.mark.slow
def test_i3d_logits_match_torch_mirror():
    params = i3d_random_params(jax.random.PRNGKey(0))
    # BN stats/beta nonzero so the BN path is actually exercised
    rng = np.random.RandomState(5)
    for unit in jax.tree_util.tree_leaves(
            params, is_leaf=lambda u: isinstance(u, dict) and "w" in u):
        if "mean" in unit:
            oc = unit["mean"].shape[0]
            unit["mean"] = jnp.asarray(rng.randn(oc).astype(np.float32) * 0.1)
            unit["var"] = jnp.asarray(
                (1 + 0.3 * rng.rand(oc)).astype(np.float32))
            unit["beta"] = jnp.asarray(rng.randn(oc).astype(np.float32) * 0.1)

    videos = (rng.rand(1, 9, 224, 224, 3).astype(np.float32) * 2 - 1)
    ours = np.asarray(i3d_apply(params, jnp.asarray(videos)))
    ref = _i3d_torch(params, videos).numpy()
    assert ours.shape == ref.shape == (1, 400)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)
