"""Fréchet Video Distance with protocol parity to the reference.

Pipeline parity with /root/reference/metrics/fvd/score.py:36-90 and fvd.py:
  * videos are split into chunks of 16; a short last chunk is padded with
    the leading videos and the padded embeddings are dropped (score.py:61-78)
  * grayscale is repeated to 3 channels (score.py:53-55)
  * frames are resized to 224x224 with TF1 legacy bilinear (align_corners
    and half-pixel-centers both False, fvd.py:52) and scaled to [-1, 1]
  * embeddings are the I3D kinetics-400 time-averaged logits
  * distance is tf.contrib.gan's frechet_classifier_distance_from_activations
    (unbiased covariance, trace-sqrt of the covariance product)

I3D weights: set SRVP_TPU_I3D_WEIGHTS or pass i3d_path (npz produced by
scripts/convert_i3d.py — TF-Hub is an online dependency the reference also
downloads at runtime).
"""

import math
import os

import numpy as np

import jax
import jax.numpy as jnp

from srvp_tpu.metrics.i3d import i3d_apply, load_i3d_npz

CHUNK = 16


def _tf1_bilinear_matrix(in_size, out_size):
    """Interpolation matrix (out, in) for TF1 resize_bilinear defaults:
    src = out_idx * (in/out), no half-pixel offset, no corner alignment."""
    scale = in_size / out_size
    src = np.arange(out_size, dtype=np.float64) * scale
    lo = np.floor(src).astype(np.int64)
    frac = src - lo
    hi = np.minimum(lo + 1, in_size - 1)
    mat = np.zeros((out_size, in_size), np.float32)
    mat[np.arange(out_size), lo] += (1.0 - frac).astype(np.float32)
    mat[np.arange(out_size), hi] += frac.astype(np.float32)
    return mat


def resize_bilinear_tf1(x, size):
    """TF1-legacy bilinear resize for NHWC batches, as two dense matmuls
    (MXU-friendly on TPU)."""
    mh = jnp.asarray(_tf1_bilinear_matrix(x.shape[1], size[0]), x.dtype)
    mw = jnp.asarray(_tf1_bilinear_matrix(x.shape[2], size[1]), x.dtype)
    y = jnp.einsum("oh,nhwc->nowc", mh, x)
    return jnp.einsum("ow,nhwc->nhoc", mw, y)


def make_embedder(i3d_params):
    @jax.jit
    def embed(videos_u8):
        """(16, T, H, W, 3) uint8 -> (16, 400) embeddings."""
        n, t = videos_u8.shape[0], videos_u8.shape[1]
        frames = videos_u8.reshape((n * t,) + videos_u8.shape[2:]).astype(jnp.float32)
        frames = resize_bilinear_tf1(frames, (224, 224))
        vids = frames.reshape(n, t, 224, 224, 3)
        vids = 2.0 * vids / 255.0 - 1.0
        return i3d_apply(i3d_params, vids)
    return embed


def compute_embeddings(embed_fn, videos):
    """videos: (N, T, H, W, C) uint8; returns (N, 400) with the reference's
    chunk-of-16 + pad-with-head behavior."""
    n = videos.shape[0]
    assert n >= CHUNK, f"FVD needs at least {CHUNK} videos, got {n}"
    gray = videos.shape[-1] == 1
    out = []
    for k in range(int(math.ceil(n / CHUNK))):
        start, stop = k * CHUNK, min(n, (k + 1) * CHUNK)
        chunk = videos[start:stop]
        n_k = stop - start
        if n_k < CHUNK:
            chunk = np.concatenate([chunk, videos[: CHUNK - n_k]], axis=0)
        if gray:
            # per-chunk so the full video set is never tripled on the host
            chunk = np.repeat(chunk, 3, axis=-1)
        emb = np.asarray(embed_fn(jnp.asarray(chunk)))
        out.append(emb[:n_k])
    return np.concatenate(out, axis=0)


def frechet_distance(act1, act2):
    """tf.contrib.gan frechet distance from activations (float64 host math)."""
    act1 = np.asarray(act1, np.float64)
    act2 = np.asarray(act2, np.float64)
    m1, m2 = act1.mean(0), act2.mean(0)
    c1 = np.cov(act1, rowvar=False)
    c2 = np.cov(act2, rowvar=False)
    # trace(sqrt(c1 c2)) via the symmetric form sqrt(sqrt(c1) c2 sqrt(c1))
    s1 = _sqrtm_psd(c1)
    inner = s1 @ c2 @ s1
    tr_sqrt = np.sum(np.sqrt(np.maximum(np.linalg.eigvalsh(inner), 0.0)))
    return float(np.sum((m1 - m2) ** 2) + np.trace(c1) + np.trace(c2)
                 - 2.0 * tr_sqrt)


def _sqrtm_psd(mat):
    vals, vecs = np.linalg.eigh(mat)
    return (vecs * np.sqrt(np.maximum(vals, 0.0))) @ vecs.T


def default_i3d_path():
    return os.environ.get("SRVP_TPU_I3D_WEIGHTS",
                          os.path.join(os.path.dirname(__file__), "i3d.npz"))


def fvd(real, fake, i3d_path=None):
    """FVD between two uint8 video sets of shape (N, T, H, W, C)."""
    path = i3d_path or default_i3d_path()
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"I3D weights npz not found at {path}; produce one with "
            "scripts/convert_i3d.py (needs tensorflow_hub) and set "
            "SRVP_TPU_I3D_WEIGHTS")
    params = load_i3d_npz(path)
    embed = make_embedder(params)
    emb_real = compute_embeddings(embed, np.asarray(real))
    emb_fake = compute_embeddings(embed, np.asarray(fake))
    return frechet_distance(emb_real, emb_fake)
