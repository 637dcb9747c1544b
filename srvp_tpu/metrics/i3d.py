"""Inflated 3D Inception (I3D, kinetics-400) feature extractor in JAX.

Re-implementation of the TF-Hub module the reference uses for FVD
(/root/reference/metrics/fvd/fvd.py:89-126, tfhub deepmind/i3d-kinetics-400/1):
Inception-v1 inflated to 3D (Carreira & Zisserman 2017). The FVD embedding is
the time-averaged 400-way logits tensor ("RGB/inception_i3d/Mean:0").

Weights load from an npz whose keys are the TF variable paths under
"RGB/inception_i3d/" (see scripts/convert_i3d.py, which produces that npz in
an environment where tensorflow_hub is available). Unit3D batch norms use
center-only affine (scale fixed at 1) with eps 1e-3, inference statistics.

All convs/pools use TF 'SAME' padding; layout is NDHWC / DHWIO.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

_CONV_DIMS = ("NDHWC", "DHWIO", "NDHWC")
_BN_EPS = 1e-3

# Inception-v1 mixed-block channel table:
# (branch0 1x1, branch1 reduce, branch1 3x3, branch2 reduce, branch2 3x3, branch3 1x1)
_MIXED = {
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}
_BRANCH_PATHS = [
    ("Branch_0/Conv3d_0a_1x1", 1),
    ("Branch_1/Conv3d_0a_1x1", 1), ("Branch_1/Conv3d_0b_3x3", 3),
    ("Branch_2/Conv3d_0a_1x1", 1), ("Branch_2/Conv3d_0b_3x3", 3),
    ("Branch_3/Conv3d_0b_1x1", 1),
]


def _unit3d(params, x, stride=(1, 1, 1), relu=True, bn=True):
    """Unit3D: conv3d SAME [+ BN(center only) + ReLU]."""
    y = lax.conv_general_dilated(
        x, params["w"].astype(x.dtype), window_strides=stride, padding="SAME",
        dimension_numbers=_CONV_DIMS, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "b" in params:
        y = y + params["b"].astype(x.dtype)
    if bn:
        inv = jax.lax.rsqrt(params["var"] + _BN_EPS)
        y = (y - params["mean"].astype(x.dtype)) * inv.astype(x.dtype) \
            + params["beta"].astype(x.dtype)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def _max_pool3d(x, window, stride):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1,) + window + (1,), (1,) + stride + (1,), "SAME")


def _avg_pool3d_valid(x, window):
    s = lax.reduce_window(
        x, 0.0, lax.add, (1,) + window + (1,), (1, 1, 1, 1, 1), "VALID")
    return s / float(np.prod(window))


def _mixed(params, x):
    b0 = _unit3d(params["b0"], x)
    b1 = _unit3d(params["b1b"], _unit3d(params["b1a"], x))
    b2 = _unit3d(params["b2b"], _unit3d(params["b2a"], x))
    b3 = _unit3d(params["b3"], _max_pool3d(x, (3, 3, 3), (1, 1, 1)))
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


def i3d_apply(params, videos):
    """videos: (N, T, 224, 224, 3) float in [-1, 1] -> (N, 400) embeddings."""
    h = _unit3d(params["Conv3d_1a_7x7"], videos, stride=(2, 2, 2))
    h = _max_pool3d(h, (1, 3, 3), (1, 2, 2))
    h = _unit3d(params["Conv3d_2b_1x1"], h)
    h = _unit3d(params["Conv3d_2c_3x3"], h)
    h = _max_pool3d(h, (1, 3, 3), (1, 2, 2))
    h = _mixed(params["Mixed_3b"], h)
    h = _mixed(params["Mixed_3c"], h)
    h = _max_pool3d(h, (3, 3, 3), (2, 2, 2))
    for name in ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"]:
        h = _mixed(params[name], h)
    h = _max_pool3d(h, (2, 2, 2), (2, 2, 2))
    h = _mixed(params["Mixed_5b"], h)
    h = _mixed(params["Mixed_5c"], h)
    h = _avg_pool3d_valid(h, (2, 7, 7))
    logits = _unit3d(params["Logits"], h, relu=False, bn=False)  # (N,T',1,1,400)
    logits = logits[:, :, 0, 0, :]
    return logits.mean(axis=1)


# ---------------------------------------------------------------------------
# Weight loading / random init (tests)
# ---------------------------------------------------------------------------

_STEM_SHAPES = {
    "Conv3d_1a_7x7": (7, 7, 7, 3, 64),
    "Conv3d_2b_1x1": (1, 1, 1, 64, 64),
    "Conv3d_2c_3x3": (3, 3, 3, 64, 192),
}


def _mixed_in_channels():
    chans = {"Mixed_3b": 192}
    order = list(_MIXED)
    for prev, cur in zip(order, order[1:]):
        c = _MIXED[prev]
        chans[cur] = c[0] + c[2] + c[4] + c[5]
    return chans


def _branch_shapes(name):
    """Returns [(key, (kt,kh,kw,ic,oc)), ...] for one mixed block."""
    c_in = _mixed_in_channels()[name]
    b0, r1, c1, r2, c2, b3 = _MIXED[name]
    specs = [("b0", c_in, b0, 1), ("b1a", c_in, r1, 1), ("b1b", r1, c1, 3),
             ("b2a", c_in, r2, 1), ("b2b", r2, c2, 3), ("b3", c_in, b3, 1)]
    return [(key, (k, k, k, ic, oc)) for key, ic, oc, k in specs]


def i3d_random_params(key, dtype=jnp.float32):
    """Random-weight I3D (for numerics tests without the real checkpoint)."""
    params = {}
    def unit(k, shape):
        oc = shape[-1]
        return {"w": 0.05 * jax.random.normal(k, shape, dtype),
                "beta": jnp.zeros((oc,), dtype),
                "mean": jnp.zeros((oc,), dtype),
                "var": jnp.ones((oc,), dtype)}
    keys = iter(jax.random.split(key, 128))
    for name, shape in _STEM_SHAPES.items():
        params[name] = unit(next(keys), shape)
    for name in _MIXED:
        params[name] = {k: unit(next(keys), shape)
                        for k, shape in _branch_shapes(name)}
    c_out = _MIXED["Mixed_5c"]
    c_final = c_out[0] + c_out[2] + c_out[4] + c_out[5]
    params["Logits"] = {
        "w": 0.05 * jax.random.normal(next(keys), (1, 1, 1, c_final, 400), dtype),
        "b": jnp.zeros((400,), dtype)}
    return params


_TF_ROOT = "RGB/inception_i3d"


def load_i3d_npz(path):
    """Loads I3D weights from an npz keyed by TF variable paths
    (scripts/convert_i3d.py output)."""
    arc = np.load(path)

    def unit(prefix, bn=True, bias=False):
        p = {"w": jnp.asarray(arc[f"{prefix}/conv_3d/w"])}
        if bias:
            p["b"] = jnp.asarray(arc[f"{prefix}/conv_3d/b"])
        if bn:
            p["beta"] = jnp.asarray(arc[f"{prefix}/batch_norm/beta"]).reshape(-1)
            p["mean"] = jnp.asarray(
                arc[f"{prefix}/batch_norm/moving_mean"]).reshape(-1)
            p["var"] = jnp.asarray(
                arc[f"{prefix}/batch_norm/moving_variance"]).reshape(-1)
        return p

    params = {}
    for name in _STEM_SHAPES:
        params[name] = unit(f"{_TF_ROOT}/{name}")
    for name in _MIXED:
        params[name] = {
            key: unit(f"{_TF_ROOT}/{name}/{path}")
            for (key, _), (path, _) in zip(_branch_shapes(name), _BRANCH_PATHS)}
    params["Logits"] = unit(f"{_TF_ROOT}/Logits/Conv3d_0c_1x1", bn=False, bias=True)
    return params
