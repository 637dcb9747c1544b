"""FVD tests: Fréchet distance math, TF1 bilinear resize, I3D plumbing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srvp_tpu.metrics.fvd import (
    compute_embeddings, frechet_distance, resize_bilinear_tf1)
from srvp_tpu.metrics.i3d import i3d_apply, i3d_random_params


class TestFrechet:
    def test_identical_distributions_zero(self):
        act = np.random.RandomState(0).randn(500, 8)
        assert frechet_distance(act, act) == pytest.approx(0.0, abs=1e-8)

    def test_matches_scipy_sqrtm(self):
        from scipy import linalg
        rng = np.random.RandomState(1)
        a = rng.randn(400, 6)
        b = 1.5 * rng.randn(500, 6) + 0.3
        m1, m2 = a.mean(0), b.mean(0)
        c1 = np.cov(a, rowvar=False)
        c2 = np.cov(b, rowvar=False)
        covmean = linalg.sqrtm(c1 @ c2)
        ref = np.sum((m1 - m2) ** 2) + np.trace(c1 + c2 - 2 * covmean.real)
        assert frechet_distance(a, b) == pytest.approx(ref, rel=1e-6)

    def test_mean_shift_analytic(self):
        # For equal covariances, FVD -> |mu1 - mu2|^2 as n grows
        rng = np.random.RandomState(2)
        a = rng.randn(20000, 4)
        b = rng.randn(20000, 4) + np.array([1.0, 0, 0, 0])
        assert frechet_distance(a, b) == pytest.approx(1.0, abs=0.05)


class TestResizeTF1:
    def test_constant_preserved(self):
        x = jnp.full((2, 64, 64, 3), 0.5, jnp.float32)
        y = resize_bilinear_tf1(x, (224, 224))
        assert y.shape == (2, 224, 224, 3)
        np.testing.assert_allclose(np.asarray(y), 0.5, rtol=1e-6)

    def test_tf1_sampling_semantics(self):
        # src = out_idx * in/out with no half-pixel offset: out[0] == in[0],
        # and a linear ramp stays linear with slope in/out.
        ramp = jnp.arange(8, dtype=jnp.float32).reshape(1, 1, 8, 1)
        ramp = jnp.broadcast_to(ramp, (1, 4, 8, 1))
        y = np.asarray(resize_bilinear_tf1(ramp, (4, 16)))[0, 0, :, 0]
        scale = 8 / 16
        expect = np.minimum(np.arange(16) * scale, 7.0)
        np.testing.assert_allclose(y, expect, rtol=1e-6)

    def test_identity_resize(self):
        x = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 1)
                        .astype(np.float32))
        np.testing.assert_allclose(np.asarray(resize_bilinear_tf1(x, (16, 16))),
                                   np.asarray(x), rtol=1e-6)


class TestI3D:
    @pytest.mark.slow
    def test_embedding_shape_and_determinism(self):
        params = i3d_random_params(jax.random.PRNGKey(0))
        vids = jnp.asarray(np.random.RandomState(0).rand(1, 9, 224, 224, 3)
                           .astype(np.float32) * 2 - 1)
        emb = i3d_apply(params, vids)
        assert emb.shape == (1, 400)
        assert np.all(np.isfinite(np.asarray(emb)))

    def test_chunking_pads_and_strips(self):
        calls = []

        def fake_embed(chunk):
            calls.append(np.asarray(chunk).shape)
            return jnp.asarray(np.asarray(chunk)[:, 0, 0, 0, :1]
                               .astype(np.float32).repeat(400, axis=1))

        vids = np.arange(20, dtype=np.uint8).reshape(20, 1, 1, 1, 1) \
            * np.ones((20, 2, 4, 4, 1), np.uint8)
        emb = compute_embeddings(fake_embed, vids)
        assert emb.shape == (20, 400)
        # two chunks of 16 (second padded from the head)
        assert calls == [(16, 2, 4, 4, 3), (16, 2, 4, 4, 3)]
        # padded entries were stripped: embeddings follow video ids
        np.testing.assert_allclose(emb[:, 0], np.arange(20))
