"""Whole-stage Pallas conv kernel: exact parity vs the XLA reference chain.

conv3x3_block_fwd must reproduce conv(act(bn_norm(x))) with padding=1
EXACTLY (edges included — unlike the clamped-halo microbenchmark scaffold),
plus the batch statistics of its raw output with batch-padding columns
masked. Interpret mode (CPU); the hardware timing lives in
scripts/microbench_conv.py / bench_step.py.

Reference chain being fused: /root/reference/module/conv.py:81-107
(make_conv_block: Conv2d -> BatchNorm2d -> LeakyReLU) at the VGG64 3x3 s1
shapes (conv.py:182-224).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import lax

from srvp_tpu.ops.pallas.conv_stage import (
    LEAKY_SLOPE, bn_scale_shift, conv3x3_block_fwd)


def xla_conv(x_cm, w):
    """Reference conv on the same channel-major layout via NHWC transpose."""
    x_nhwc = jnp.transpose(x_cm, (3, 1, 2, 0))
    y = lax.conv_general_dilated(x_nhwc, w, (1, 1), [(1, 1), (1, 1)],
                                 dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return jnp.transpose(y, (3, 1, 2, 0))


@pytest.mark.parametrize("packed", [True, False])
@pytest.mark.parametrize("h,w,bh", [(16, 8, 2), (16, 8, 4), (8, 16, 2)])
def test_fwd_exact_vs_xla_no_transform(h, w, bh, packed):
    cin, cout, n = 8, 16, 128
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(cin, h, w, n).astype(np.float32))
    wgt = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    y, stats = conv3x3_block_fwd(x, wgt, act="none", bh=bh, bn=128,
                                 interpret=True, packed=packed)
    ref = xla_conv(x, wgt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
    yf = np.asarray(ref, np.float64)
    np.testing.assert_allclose(np.asarray(stats[:, 0]),
                               yf.sum((1, 2, 3)), rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(stats[:, 1]),
                               (yf * yf).sum((1, 2, 3)), rtol=1e-5, atol=1e-3)


def test_fwd_fused_norm_act_chain_matches_reference_blocks():
    """Two chained blocks with on-the-fly BN+LeakyReLU must equal the
    unfused reference: y2 = conv2(lrelu(bn(conv1(lrelu(x)))))."""
    cin, cmid, cout, h, w, n = 4, 8, 8, 8, 8, 256
    n_valid = 200  # padded batch: stats must ignore columns >= 200
    rng = np.random.RandomState(1)
    x = rng.randn(cin, h, w, n).astype(np.float32)
    x[..., n_valid:] = 7.7  # garbage in the padded region
    x = jnp.asarray(x)
    w1 = jnp.asarray(0.4 * rng.randn(3, 3, cin, cmid).astype(np.float32))
    w2 = jnp.asarray(0.4 * rng.randn(3, 3, cmid, cout).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.randn(cmid).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.randn(cmid).astype(np.float32))

    # fused pallas chain
    y1, st1 = conv3x3_block_fwd(x, w1, act="leaky_relu", n_valid=n_valid,
                                bh=2, bn=128, interpret=True)
    scale, shift = bn_scale_shift(st1, gamma, beta, n_valid, h * w)
    y2, st2 = conv3x3_block_fwd(y1, w2, scale=scale, shift=shift,
                                act="leaky_relu", n_valid=n_valid,
                                bh=2, bn=128, interpret=True)

    # unfused reference on the valid columns
    xv = x[..., :n_valid]
    a0 = jnp.maximum(xv, LEAKY_SLOPE * xv)
    r1 = xla_conv(a0, w1)
    mean = r1.mean(axis=(1, 2, 3))
    var = ((r1 - mean[:, None, None, None]) ** 2).mean(axis=(1, 2, 3))
    xh = (r1 - mean[:, None, None, None]) \
        * jax.lax.rsqrt(var + 1e-5)[:, None, None, None]
    b1 = xh * gamma[:, None, None, None] + beta[:, None, None, None]
    a1 = jnp.maximum(b1, LEAKY_SLOPE * b1)
    r2 = xla_conv(a1, w2)

    np.testing.assert_allclose(np.asarray(y1[..., :n_valid]), np.asarray(r1),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(y2[..., :n_valid]), np.asarray(r2),
                               atol=3e-4)
    rf = np.asarray(r2, np.float64)
    np.testing.assert_allclose(np.asarray(st2[:, 0]), rf.sum((1, 2, 3)),
                               rtol=1e-4, atol=1e-2)


def test_fwd_tanh_act():
    cin, cout, h, w, n = 4, 4, 8, 8, 128
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(cin, h, w, n).astype(np.float32))
    wgt = jnp.asarray(0.3 * rng.randn(3, 3, cin, cout).astype(np.float32))
    y, _ = conv3x3_block_fwd(x, wgt, act="tanh", bh=2, bn=128,
                             interpret=True)
    ref = xla_conv(jnp.tanh(x), wgt)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), atol=2e-5)
