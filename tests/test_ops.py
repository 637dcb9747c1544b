"""Parity tests for core math ops against PyTorch semantics (CPU torch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from srvp_tpu.ops import convops, dists


def t2j(t):
    return jnp.asarray(t.detach().numpy())


class TestDists:
    def test_split_raw_params_matches_torch_softplus(self):
        raw = np.random.RandomState(0).randn(4, 10).astype(np.float32)
        loc, scale = dists.split_raw_params(jnp.asarray(raw))
        t_loc, t_raw = torch.chunk(torch.from_numpy(raw), 2, -1)
        t_scale = F.softplus(t_raw) + 1e-8
        np.testing.assert_allclose(np.asarray(loc), t_loc.numpy(), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(scale), t_scale.numpy(), rtol=1e-6)

    def test_neg_logprob_matches_torch(self):
        rng = np.random.RandomState(1)
        loc = rng.randn(3, 5).astype(np.float32)
        data = rng.randn(3, 5).astype(np.float32)
        for scale in (1.0, 0.2, 0.71):
            ours = dists.neg_logprob(jnp.asarray(loc), jnp.asarray(data), scale)
            ref = -torch.distributions.Normal(
                torch.from_numpy(loc), scale).log_prob(torch.from_numpy(data))
            np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    def test_kl_vs_std_normal_matches_torch(self):
        raw = np.random.RandomState(2).randn(6, 8).astype(np.float32)
        ours = dists.kl_raw_vs_std_normal(jnp.asarray(raw))
        t_loc, t_raw = torch.chunk(torch.from_numpy(raw), 2, -1)
        q = torch.distributions.Normal(t_loc, F.softplus(t_raw) + 1e-8)
        ref = torch.distributions.kl_divergence(q, torch.distributions.Normal(0.0, 1.0))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-5)

    def test_kl_raw_vs_raw_matches_torch(self):
        rng = np.random.RandomState(3)
        raw_q = rng.randn(6, 8).astype(np.float32)
        raw_p = rng.randn(6, 8).astype(np.float32)
        ours = dists.kl_raw_vs_raw(jnp.asarray(raw_q), jnp.asarray(raw_p))

        def mk(raw):
            loc, r = torch.chunk(torch.from_numpy(raw), 2, -1)
            return torch.distributions.Normal(loc, F.softplus(r) + 1e-8)

        ref = torch.distributions.kl_divergence(mk(raw_q), mk(raw_p))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-4)

    def test_rsample_stats(self):
        raw = jnp.concatenate(
            [2.0 * jnp.ones((20000, 1)), jnp.zeros((20000, 1))], axis=-1)
        s = dists.rsample(raw, jax.random.PRNGKey(0))
        # softplus(0) = log(2) ~ 0.693
        assert abs(float(s.mean()) - 2.0) < 0.02
        assert abs(float(s.std()) - float(np.log(2.0))) < 0.02


class TestConvOps:
    @pytest.mark.parametrize("k,s,p,cin,cout,hw", [
        (4, 2, 1, 3, 8, 64),   # dcgan encoder block
        (3, 1, 1, 4, 4, 16),   # vgg block
        (4, 1, 0, 8, 16, 4),   # final valid conv
    ])
    def test_conv2d_matches_torch(self, k, s, p, cin, cout, hw):
        rng = np.random.RandomState(k + s + p)
        x = rng.randn(2, cin, hw, hw).astype(np.float32)
        w = rng.randn(cout, cin, k, k).astype(np.float32) * 0.1
        ref = F.conv2d(torch.from_numpy(x), torch.from_numpy(w), stride=s, padding=p)
        ours = convops.conv2d(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(w, (2, 3, 1, 0))), stride=s, padding=p)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
            rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("k,s,p,cin,cout,hw", [
        (4, 1, 0, 16, 8, 1),   # first upconv 1x1 -> 4x4
        (4, 2, 1, 8, 4, 8),    # dcgan upconv
        (3, 1, 1, 4, 3, 32),   # vgg final convT
    ])
    def test_conv_transpose2d_matches_torch(self, k, s, p, cin, cout, hw):
        rng = np.random.RandomState(10 * k + s)
        x = rng.randn(2, cin, hw, hw).astype(np.float32)
        w = rng.randn(cin, cout, k, k).astype(np.float32) * 0.1
        ref = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                                 stride=s, padding=p)
        ours = convops.conv_transpose2d(
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(np.transpose(w, (2, 3, 0, 1))), stride=s, padding=p)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(),
            rtol=1e-4, atol=1e-4)

    def test_max_pool_matches_torch(self):
        x = np.random.RandomState(5).randn(2, 3, 16, 16).astype(np.float32)
        ref = F.max_pool2d(torch.from_numpy(x), 2, 2)
        ours = convops.max_pool2d(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(), rtol=1e-6)

    def test_upsample_nearest_matches_torch(self):
        x = np.random.RandomState(6).randn(2, 3, 8, 8).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), scale_factor=2, mode="nearest")
        ours = convops.upsample_nearest2x(jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref.numpy(), rtol=1e-6)

    def test_leaky_relu_matches_torch(self):
        x = np.random.RandomState(7).randn(100).astype(np.float32)
        ref = F.leaky_relu(torch.from_numpy(x), 0.2)
        ours = convops.leaky_relu(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-6)


def test_conv2d_smallcin_matches_direct_conv():
    """Patch-gather + GEMM stem-conv formulation (kept as a building block,
    not routed by default — see convops._conv2d_smallcin) must match the
    direct conv exactly for the stem shapes of both archis."""
    from jax import lax
    rs = np.random.RandomState(11)
    for (k, s, p, ci, co, h) in [(4, 2, 1, 1, 8, 16),   # dcgan stem
                                 (3, 1, 1, 3, 8, 16)]:  # vgg stem, RGB
        x = jnp.asarray(rs.randn(2, h, h, ci).astype(np.float32))
        w = jnp.asarray(rs.randn(k, k, ci, co).astype(np.float32))
        ref = lax.conv_general_dilated(
            x, w, (s, s), [(p, p), (p, p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = convops._conv2d_smallcin(x, w, (s, s), [(p, p), (p, p)])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
