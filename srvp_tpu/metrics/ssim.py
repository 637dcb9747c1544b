"""SSIM metric, protocol-parity with the reference's vendored implementation.

Reference: /root/reference/metrics/ssim.py:81-149 (PyTorch PR #22289):
  * 11x11 Gaussian kernel built by softmax over the -(x^2+y^2)/(2 sigma^2)
    grid (NOT a normalized Gaussian — softmax of the log-kernel), sigma=1.5
  * depthwise VALID convolutions for the local moments
  * ssim = ((2 mu1 mu2 + c1)(2 sigma12 + c2)) /
           ((mu1^2 + mu2^2 + c1)(sigma1^2 + sigma2^2 + c2)), k1=.01, k2=.03

Inputs are NHWC; reduction 'none' returns the per-pixel SSIM map like the
reference's reduction='none' (shape (N, H-10, W-10, C)).
"""

import numpy as np

import jax.numpy as jnp

from srvp_tpu.ops.convops import depthwise_conv2d


def gaussian_kernel(size=11, sigma=1.5, channels=1):
    """(size, size, 1, channels) depthwise kernel, softmax-normalized."""
    coords = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    grid = -(coords[None, :] ** 2 + coords[:, None] ** 2) / (2.0 * sigma ** 2)
    flat = np.exp(grid.reshape(-1) - grid.max())
    kern = (flat / flat.sum()).reshape(size, size).astype(np.float32)
    return jnp.asarray(np.tile(kern[:, :, None, None], (1, 1, 1, channels)))


def ssim(x, y, max_val=1.0, filter_size=11, k1=0.01, k2=0.03, sigma=1.5):
    """Per-pixel SSIM map of two NHWC batches (VALID windows)."""
    c = x.shape[-1]
    kernel = gaussian_kernel(filter_size, sigma, c).astype(x.dtype)
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2

    mu1 = depthwise_conv2d(x, kernel)
    mu2 = depthwise_conv2d(y, kernel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = depthwise_conv2d(x * x, kernel) - mu1_sq
    sigma2_sq = depthwise_conv2d(y * y, kernel) - mu2_sq
    sigma12 = depthwise_conv2d(x * y, kernel) - mu1_mu2

    num = (2 * mu1_mu2 + c1) * (2 * sigma12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    return num / den


def video_ssim(pred, target, max_val=1.0):
    """(T, B, H, W, C) videos -> per-(frame, video, channel) SSIM (T, B, C).

    Matches test.py's _ssim_wrapper (/root/reference/test.py:36-57): the
    per-pixel map is averaged spatially per frame and channel.
    """
    t, b = pred.shape[0], pred.shape[1]
    flat_p = pred.reshape((t * b,) + pred.shape[2:])
    flat_t = target.reshape((t * b,) + target.shape[2:])
    maps = ssim(flat_p, flat_t, max_val=max_val)
    return maps.mean(axis=(1, 2)).reshape(t, b, pred.shape[-1])
