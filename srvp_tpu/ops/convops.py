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

import jax
import jax.numpy as jnp
from jax import lax

_DIMS = ("NHWC", "HWIO", "NHWC")


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
    pads = [(kh - 1 - p[0], kh - 1 - p[0]), (kw - 1 - p[1], kw - 1 - p[1])]
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1), padding=pads,
        lhs_dilation=s, dimension_numbers=_DIMS)


def max_pool2d(x, window=2, stride=2):
    """torch.nn.MaxPool2d(window, stride, padding=0) equivalent. x: NHWC.

    For the model's window == stride case the pool is a reshape + max over
    the (h, w) sub-window axes: one VPU pass with plain layouts, instead of
    reduce_window whose TPU lowering picks batch-minor layouts that force
    full-tensor layout copies around it (measured on the KTH vgg step).
    """
    n, h, w, c = x.shape
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

    Single broadcast over both spatial axes (one HBM pass fwd, one reduce
    bwd) rather than two jnp.repeat calls, which cost two materialized
    broadcast+reduce pairs on the profile.
    """
    n, h, w, c = x.shape
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
