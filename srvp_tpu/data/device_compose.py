"""On-device Moving MNIST compositing.

Host->device bandwidth is the training bottleneck for synthetic video data:
a (15, 128, 64, 64) uint8 batch is 7.8MB, but the information content is just
the digit images and their trajectories (~0.2MB). The host computes
trajectories (branchy bounce physics, srvp_tpu/data/mmnist.py) and the TPU
composites frames inside the jitted train step — a 35x transfer reduction.

Compositing parity: uint16 accumulate + clamp 255, identical to the host
generators (Python and C++), so the composited batch is bit-equal to
MovingMNIST.get_item for the same seeds.
"""

import jax
import jax.numpy as jnp
import numpy as np


def composite_mmnist(digits, pos, frame_size=64):
    """digits: (B, D, h, w) uint8; pos: (B, D, T, 2) int32 top-left corners.

    Returns (T, B, frame_size, frame_size, 1) uint8 video batch.
    """
    bsz, n_dig, h, w = digits.shape
    t_len = pos.shape[2]
    # Pad each digit into a (2fs, 2fs) canvas with the image at (fs, fs);
    # placing it at (sx, sy) is then a dynamic_slice at (fs - sx, fs - sy).
    # Slice starts range over [h, fs] and ends over [fs + h, 2fs], so the
    # 2fs canvas keeps every slice in-bounds (dynamic_slice would silently
    # clamp otherwise).
    pad_h = pad_w = 2 * frame_size
    padded = jnp.zeros((bsz, n_dig, pad_h, pad_w), jnp.uint16)
    padded = padded.at[:, :, frame_size:frame_size + h,
                       frame_size:frame_size + w].set(digits.astype(jnp.uint16))

    def place(img_pad, sxy):
        return jax.lax.dynamic_slice(
            img_pad, (frame_size - sxy[0], frame_size - sxy[1]),
            (frame_size, frame_size))

    # vmap over batch, digit, time
    place_t = jax.vmap(place, in_axes=(None, 0))          # time
    place_d = jax.vmap(place_t, in_axes=(0, 0))           # digit
    place_b = jax.vmap(place_d, in_axes=(0, 0))           # batch
    frames = place_b(padded, pos)                         # (B, D, T, fs, fs)
    video = jnp.minimum(frames.sum(axis=1), 255).astype(jnp.uint8)
    return jnp.transpose(video, (1, 0, 2, 3))[..., None]  # (T, B, fs, fs, 1)


def is_parts_batch(batch):
    return isinstance(batch, dict) and "digits" in batch and "pos" in batch


def materialize(batch, frame_size=64):
    """Parts dict or dense array -> float32 (T, B, H, W, C) in [0, 1]."""
    if is_parts_batch(batch):
        batch = composite_mmnist(batch["digits"], batch["pos"], frame_size)
    if batch.dtype == jnp.uint8:
        batch = batch.astype(jnp.float32) / 255.0
    return batch


def parts_collate(items):
    """Collates [(digits (D,h,w), pos (D,T,2)), ...] into the parts dict."""
    return {
        "digits": np.stack([it[0] for it in items]),
        "pos": np.stack([it[1] for it in items]).astype(np.int32),
    }
