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

import jax.numpy as jnp
import numpy as np


def composite_mmnist(digits, pos, frame_size=64):
    """digits: (B, D, h, w) uint8; pos: (B, D, T, 2) int32 top-left corners.

    Returns (T, B, frame_size, frame_size, 1) uint8 video batch.

    MXU formulation: placing a digit at (sx, sy) is two one-hot placement
    matmuls, P_x @ digit @ P_y^T with P_x[x, r] = (x == sx + r) — batched
    over (B, D, T) as two einsums. No dynamic addressing: the previous
    dynamic_slice version issued B·D·T tiny unaligned slices from padded
    canvases and cost 7.0 ms per (128, 2, 15) batch on a v5e chip; this one
    costs 0.9 ms, bit-equal (docs/DESIGN.md "Round-4 live-loop breakdown").

    Exactness: uint8 values are integers <= 255, exact in bf16 (8
    significand bits); each output of a one-hot contraction is a sum with
    at most ONE nonzero product, so both matmuls are exact; the digit sum
    accumulates in fp32 (exact to 2^24), then clamps at 255 — identical to
    the host generators' uint16-accumulate + clamp.
    """
    bsz, n_dig, h, w = digits.shape
    fx = jnp.arange(frame_size)
    sx, sy = pos[..., 0], pos[..., 1]                     # (B, D, T)
    oh_x = (fx[None, None, None, :, None] ==
            sx[..., None, None] + jnp.arange(h)[None, None, None, None, :]
            ).astype(jnp.bfloat16)                        # (B, D, T, fs, h)
    oh_y = (fx[None, None, None, :, None] ==
            sy[..., None, None] + jnp.arange(w)[None, None, None, None, :]
            ).astype(jnp.bfloat16)                        # (B, D, T, fs, w)
    d = digits.astype(jnp.bfloat16)
    placed_y = jnp.einsum("bdrc,bdtyc->bdtry", d, oh_y,
                          preferred_element_type=jnp.float32)
    frames = jnp.einsum("bdtxr,bdtry->bdtxy", oh_x, placed_y,
                        preferred_element_type=jnp.float32)  # (B, D, T, fs, fs)
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
