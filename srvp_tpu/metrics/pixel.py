"""Pixel-space metrics: MSE / PSNR, reference-protocol shapes.

Protocol parity with /root/reference/train.py:177-186 and test.py:249-251:
MSE is averaged over the two spatial dims only, PSNR = 10*log10(1/MSE) is
then averaged over frames/channels by callers, keeping per-(frame, video,
channel) granularity until the final reduction.
"""

import jax.numpy as jnp


def frame_mse(pred, target):
    """(T, B, H, W, C) pairs -> per-(frame, video, channel) MSE (T, B, C)."""
    d = pred.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(jnp.square(d), axis=(2, 3))


def psnr_from_mse(mse, max_val=1.0):
    return 10.0 * jnp.log10((max_val * max_val) / mse)


def frame_psnr(pred, target, max_val=1.0):
    """(T, B, H, W, C) pairs -> per-(frame, video, channel) PSNR (T, B, C)."""
    return psnr_from_mse(frame_mse(pred, target), max_val)
