"""Pallas spatial kernels (2x2 maxpool, 2x nearest upsample) vs the jnp
fallback paths in ops/convops.py — forward and VJP parity, interpreter mode
on CPU. The real-TPU dispatch in convops.max_pool2d/upsample_nearest2x uses
these kernels for exactly the shapes covered here."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srvp_tpu.ops import convops
from srvp_tpu.ops.pallas import spatial


def _jnp_pool(x):
    n, h, w, c = x.shape
    return jnp.max(x.reshape(n, h // 2, 2, w // 2, 2, c), axis=(2, 4))


def _jnp_up(x):
    n, h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(
            n, 2 * h, 2 * w, c)


@pytest.mark.parametrize("shape", [
    (3, 8, 8, 5),      # tiny, single grid step
    (7, 16, 16, 12),   # odd batch -> padded final grid step
    (2, 64, 64, 3),    # gridded over H (bh=8)
    (1, 4, 4, 130),    # h < 8 block, c > one lane tile
])
def test_maxpool_forward_matches_jnp(shape):
    x = jnp.asarray(np.random.RandomState(0).randn(*shape).astype(np.float32))
    got = spatial.max_pool2x2(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_jnp_pool(x)))


@pytest.mark.parametrize("shape", [(3, 8, 8, 5), (2, 32, 32, 7), (1, 4, 4, 3)])
def test_upsample_forward_matches_jnp(shape):
    x = jnp.asarray(np.random.RandomState(1).randn(*shape).astype(np.float32))
    got = spatial.upsample2x(x, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(_jnp_up(x)))


def test_maxpool_grad_matches_jnp_including_ties():
    # Integer-valued inputs force exact ties inside 2x2 windows; the kernel
    # must split the gradient equally across tied maxima like jnp.max does.
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randint(0, 3, size=(4, 16, 16, 6)).astype(np.float32))
    g = jnp.asarray(rs.randn(4, 8, 8, 6).astype(np.float32))

    ref, ref_vjp = jax.vjp(_jnp_pool, x)
    got, got_vjp = jax.vjp(lambda v: spatial.max_pool2x2(v, True), x)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    np.testing.assert_allclose(np.asarray(got_vjp(g)[0]),
                               np.asarray(ref_vjp(g)[0]), rtol=1e-6, atol=1e-6)


def test_upsample_grad_matches_jnp():
    rs = np.random.RandomState(3)
    x = jnp.asarray(rs.randn(2, 8, 8, 5).astype(np.float32))
    g = jnp.asarray(rs.randn(2, 16, 16, 5).astype(np.float32))
    _, ref_vjp = jax.vjp(_jnp_up, x)
    _, got_vjp = jax.vjp(lambda v: spatial.upsample2x(v, True), x)
    np.testing.assert_allclose(np.asarray(got_vjp(g)[0]),
                               np.asarray(ref_vjp(g)[0]), rtol=1e-6, atol=1e-6)


def test_bf16_roundtrip():
    x = jnp.asarray(np.random.RandomState(4).randn(2, 8, 8, 4),
                    dtype=jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(spatial.max_pool2x2(x, interpret=True), dtype=np.float32),
        np.asarray(_jnp_pool(x), dtype=np.float32))
    np.testing.assert_array_equal(
        np.asarray(spatial.upsample2x(x, interpret=True), dtype=np.float32),
        np.asarray(_jnp_up(x), dtype=np.float32))


def test_dispatch_predicate():
    assert spatial.supported(jnp.zeros((2, 16, 16, 4)))
    assert spatial.supported(jnp.zeros((2, 4, 4, 4)))
    assert not spatial.supported(jnp.zeros((2, 15, 16, 4)))   # odd H
    assert not spatial.supported(jnp.zeros((2, 16, 16)))      # not 4-D
    # CPU backend: convops must keep using the jnp paths (no Pallas).
    x = jnp.asarray(np.random.RandomState(5).randn(2, 8, 8, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(convops.max_pool2d(x)),
                                  np.asarray(_jnp_pool(x)))
    np.testing.assert_array_equal(np.asarray(convops.upsample_nearest2x(x)),
                                  np.asarray(_jnp_up(x)))
