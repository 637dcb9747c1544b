"""Convolution primitives with PyTorch numerics on TPU-native NHWC/HWIO layouts.

The reference relies on torch/cuDNN Conv2d, ConvTranspose2d, MaxPool2d and
nearest Upsample (/root/reference/module/conv.py). Here each op is expressed
as a single `lax` primitive so XLA:TPU can tile it onto the MXU and fuse the
surrounding elementwise work. Padding is explicit (torch-style integer
padding), never 'SAME', so outputs match torch bit-for-bit in fp32.

Kernels are stored HWIO. For conv_transpose the kernel is stored with
I = input channels of the op (torch convT weight (Cin, Cout, kh, kw)
transposed to (kh, kw, Cin, Cout)); the spatial flip that makes a transposed
convolution a dilated direct convolution happens at apply time.
"""

import os

import jax
import jax.numpy as jnp
from jax import lax

from srvp_tpu.ops.pallas import spatial as _spatial

_DIMS = ("NHWC", "HWIO", "NHWC")


def _pallas_spatial_max_hw():
    """Spatial-size cap for routing pool/upsample to the Pallas kernels
    (ops/pallas/spatial.py). SRVP_PALLAS_SPATIAL=N enables them on TPU for
    feature maps up to NxN; 0 (the default) keeps XLA's lowerings.

    Measured on the KTH vgg train step (v5e): ungated Pallas routing is a
    net LOSS (316 vs 284 ms/step) — the custom-VJP call boundary blocks
    XLA's elementwise fusion into neighboring ops and its layout
    constraints insert full-tensor copies at the 64x64/32x32 sites, more
    than the one-pass kernels save. The kernels are kept (bit-exact parity
    with the jnp paths, tests/test_pallas_spatial.py) as opt-in and for
    the small-spatial sites where XLA materializes 6-D intermediates."""
    if jax.default_backend() != "tpu":
        return 0
    return int(os.environ.get("SRVP_PALLAS_SPATIAL", "0"))


def conv2d(x, w, stride=1, padding=0):
    """torch.nn.functional.conv2d equivalent. x: NHWC, w: HWIO.

    Output dtype == input dtype; for bf16 inputs the TPU MXU accumulates in
    fp32 internally. (An explicit fp32 preferred_element_type would break the
    conv transpose rule under autodiff with mixed dtypes.)
    """
    s = (stride, stride) if isinstance(stride, int) else stride
    p = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=s, padding=p,
        dimension_numbers=_DIMS)


def _conv2d_smallcin(x, w, s, p):
    """Encoder-stem conv (Cin <= 4) as shifted-patch gather + 1x1 matmul.

    NOT routed by default: although XLA's direct lowering of the stem
    (K = kh*kw*Cin of 9-48) profiles ~23x below the memory bound, swapping
    in this formulation measured net-SLOWER at the step level (dcgan
    25.6 -> 26.2 ms, kth 290 -> 294 ms) — the same global layout/fusion
    equilibrium effect as every other local rewrite tried in round 2 (see
    docs/DESIGN.md). Kept (with CPU-verified parity in tests/test_ops.py)
    as the building block for a future whole-stage rewrite.
    """
    kh, kw, ci, co = w.shape
    n, h, ww_, _ = x.shape
    oh = (h + p[0][0] + p[0][1] - kh) // s[0] + 1
    ow = (ww_ + p[1][0] + p[1][1] - kw) // s[1] + 1
    xp = jnp.pad(x, ((0, 0), p[0], p[1], (0, 0)))
    taps = [
        lax.slice(xp, (0, ky, kx, 0),
                  (n, ky + (oh - 1) * s[0] + 1, kx + (ow - 1) * s[1] + 1, ci),
                  (1, s[0], s[1], 1))
        for ky in range(kh) for kx in range(kw)
    ]
    patches = jnp.concatenate(taps, axis=-1)          # (N, oh, ow, kh*kw*ci)
    wm = w.astype(x.dtype).reshape(kh * kw * ci, co)
    return lax.dot_general(patches, wm, (((3,), (0,)), ((), ())))


def conv_transpose2d(x, w, stride=1, padding=0):
    """torch.nn.functional.conv_transpose2d equivalent.

    x: NHWC; w: HWIO with I = x channels, O = output channels, in torch's
    orientation (spatially flipped at apply time).
    output size = (in - 1) * stride - 2 * padding + kernel.
    """
    return conv_transpose2d_preflipped(
        x, jnp.flip(w, axis=(0, 1)), stride, padding)


def conv_transpose2d_preflipped(x, w, stride=1, padding=0):
    """Transposed conv whose kernel is stored ALREADY spatially flipped —
    the model's storage convention (srvp_tpu/models/layers.py), which avoids
    materializing a flipped copy of every convT kernel on every training
    step. Torch checkpoints are flipped once at conversion time
    (utils/torch_convert.py); random init is flip-invariant (i.i.d.).
    """
    kh, kw = w.shape[0], w.shape[1]
    s = (stride, stride) if isinstance(stride, int) else stride
    p = (padding, padding) if isinstance(padding, int) else padding
    if x.shape[1] == x.shape[2] == 1 and p == (0, 0):
        # Transposed conv from a 1x1 input IS a dense layer producing the
        # kh x kw output directly: out[n,oy,ox,co] = sum_ci x[n,ci] *
        # W_unflipped[oy,ox,ci,co]. XLA's conv lowering runs this decoder
        # stem at ~1% MFU (8.7 ms of the 24.5 ms dcgan step); the GEMM
        # form runs at matmul speed. The stored kernel is pre-flipped, so
        # flip the (static, tiny) spatial dims back before folding them
        # into the GEMM's output dim.
        n, ci = x.shape[0], x.shape[3]
        co = w.shape[3]
        wm = jnp.flip(w, axis=(0, 1)).astype(x.dtype)
        wm = wm.transpose(2, 0, 1, 3).reshape(ci, kh * kw * co)
        return (x.reshape(n, ci) @ wm).reshape(n, kh, kw, co)
    # NOTE: a phase-decomposed formulation of the 4x4/s2/p1 case (four 2x2
    # stride-1 convs + interleave — the standard dense-MAC rewrite of a
    # strided convT) was measured at 36.9 ms vs 25.4 ms for the dcgan step:
    # the interleave materialization and lost BN-stat fusion cost more than
    # the ~10% MXU utilization of XLA's lhs_dilation lowering.
    pads = [(kh - 1 - p[0], kh - 1 - p[0]), (kw - 1 - p[1], kw - 1 - p[1])]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=pads,
        lhs_dilation=s, dimension_numbers=_DIMS)


def max_pool2d(x, window=2, stride=2):
    """torch.nn.MaxPool2d(window, stride, padding=0) equivalent. x: NHWC.

    On TPU the 2x2 case at small spatial dims routes to a Pallas kernel
    (ops/pallas/spatial.py, see _pallas_spatial_max_hw for the measured
    gating). Elsewhere the pool is a reshape + max over the (h, w)
    sub-window axes (one VPU pass with plain layouts) with reduce_window
    as the general fallback. Gradient semantics for ties differ by path:
    the reshape and Pallas paths share a tied window's gradient equally
    among the maxima, while the reduce_window fallback's VJP lowers to
    select-and-scatter, which routes the whole gradient to a single winner
    (matching torch). Model shapes (2x2/2 on even dims) never hit the
    fallback, so training numerics are unaffected; callers with
    window != stride should be aware of the one-winner tie behavior.
    """
    n, h, w, c = x.shape
    if (window == 2 and stride == 2
            and _spatial.supported(x, _pallas_spatial_max_hw())):
        return _spatial.max_pool2x2(x)
    if window == stride and h % window == 0 and w % window == 0:
        xw = x.reshape(n, h // window, window, w // window, window, c)
        return jnp.max(xw, axis=(2, 4))
    return lax.reduce_window(
        x, -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding="VALID",
    )


def upsample_nearest2x(x):
    """torch.nn.Upsample(scale_factor=2, mode='nearest') equivalent. x: NHWC.

    On TPU at small spatial dims this routes to a Pallas kernel
    (ops/pallas/spatial.py, see _pallas_spatial_max_hw): one HBM pass fwd
    (duplicate in VMEM) and one bwd (2x2 sum of the cotangent). Elsewhere:
    a single broadcast over both spatial axes rather than two jnp.repeat
    calls, which cost two materialized broadcast+reduce pairs on the
    profile.
    """
    n, h, w, c = x.shape
    if _spatial.supported(x, _pallas_spatial_max_hw()):
        return _spatial.upsample2x(x)
    return jnp.broadcast_to(
        x[:, :, None, :, None, :], (n, h, 2, w, 2, c)).reshape(n, 2 * h, 2 * w, c)


def depthwise_conv2d(x, w, padding=0):
    """Depthwise (grouped, groups == channels) conv for the SSIM metric.

    x: NHWC, w: (kh, kw, 1, C) — one filter per channel.
    """
    c = x.shape[-1]
    p = [(padding, padding)] * 2 if isinstance(padding, int) else padding
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=p,
        dimension_numbers=_DIMS, feature_group_count=c,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def leaky_relu(x, negative_slope=0.2):
    return jax.nn.leaky_relu(x, negative_slope)


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "elu": jax.nn.elu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
}


def activation(name):
    """Activation lookup (parity with /root/reference/module/utils.py:23-48)."""
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"Activation function '{name}' not yet implemented")
