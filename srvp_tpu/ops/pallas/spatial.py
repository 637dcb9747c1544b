"""Pallas spatial kernels: 2x2 max-pool and 2x nearest upsample (NHWC API).

Why these exist: the VGG encoder/decoder (reference
/root/reference/module/conv.py:182-224,308-355) interleaves 3x3 convs with
MaxPool2d(2) / Upsample(2). At training shapes the pool/upsample tensors are
the largest in the model (~1 GiB at 64x64 with time folded into the batch),
and every XLA lowering tried (reduce_window + select-and-scatter, 6-D
reshape+max, broadcast+reshape) either materializes an extra full-size
intermediate or forces layout copies around it (measured ~45 ms/step of the
KTH vgg train step).

Layout strategy: XLA lays these activations out batch-minor
({0,3,2,1}: N in lanes, C in sublanes, W, H major->minor) because N = T*B
(~2000) tiles the 128-lane dim with ~3% padding, whereas C-minor would pad
C=64 2x. The kernels therefore run on a logically transposed (H, W, C, N)
view: for a batch-minor NHWC tensor that transpose is a pure layout bitcast
(zero copies), the pallas_call's row-major block requirement matches the
physical bytes, and both pooled dims (H, W) are MAJOR dims of the block —
window regrouping touches no tiled (sublane/lane) axis, so every reshape
and broadcast below is free in Mosaic.

Gradient semantics of the pool match `jnp.max` over window axes: ties share
the incoming gradient equally (cnt-weighted), which is what the jnp
fallback path (ops/convops.py) produces under autodiff.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def supported(x, max_hw=None):
    """Whether these kernels apply to `x` (4-D NHWC, even H/W).

    max_hw additionally bounds the spatial size: measured on the KTH vgg
    train step, these kernels beat XLA's reshape/broadcast lowerings only
    at small spatial dims (<= 8x8, where XLA materializes 6-D
    intermediates around the window ops) and lose at 32x32/64x64 (where
    the custom-VJP call boundary blocks profitable elementwise fusion
    into neighboring ops)."""
    if x.ndim != 4:
        return False
    _, h, w, _ = x.shape
    if max_hw is not None and max(h, w) > max_hw:
        return False
    return h % 2 == 0 and w % 2 == 0


def _pad(v, m):
    return -(-v // m) * m


def _tiles(h, w, c, n, itemsize, scale_max, budget=2 * 1024 * 1024):
    """Pick (bh, bc, bn): H-rows, channel-sublanes and batch-lanes per
    block, sized so the largest block (`scale_max` x the input's spatial
    dims) stays under ~budget bytes of VMEM as Mosaic allocates it
    (C padded to 8 sublanes, N padded to 128 lanes). N below 128 lanes
    saves nothing (lane padding), so beyond that only C and H shrink."""
    def nbytes(bh, bc, bn):
        return (int(bh * scale_max) * int(w * scale_max)
                * _pad(bc, 8) * _pad(bn, 128) * itemsize)

    bh_c = [v for v in (8, 4, 2) if h % v == 0] or [h]
    bn_c = sorted({min(n, v) for v in (512, 256, 128)}, reverse=True)
    bc_c = [c] + [v for v in (64, 32, 16, 8) if v < c]
    for bc in bc_c:
        for bn in bn_c:
            for bh in bh_c:
                if nbytes(bh, bc, bn) <= budget:
                    return bh, bc, bn
    return bh_c[-1], bc_c[-1], bn_c[-1]


# ---------------------------------------------------------------------------
# in-VMEM window helpers (blocks are (H, W, C, N); H and W are major dims)
# ---------------------------------------------------------------------------

def _pool2x2(x, op):
    """(H, W, C, N) -> (H/2, W/2, C, N) combining each 2x2 window with op."""
    h, w, c, n = x.shape
    x = op(x.reshape(h // 2, 2, w, c, n), axis=1)
    return op(x.reshape(h // 2, w // 2, 2, c, n), axis=2)


def _up2x2(x):
    """(H, W, C, N) -> (2H, 2W, C, N) nearest-neighbor duplication."""
    h, w, c, n = x.shape
    x = jax.lax.broadcast_in_dim(
        x, (h, 2, w, c, n), (0, 2, 3, 4)).reshape(2 * h, w, c, n)
    return jax.lax.broadcast_in_dim(
        x, (2 * h, w, 2, c, n), (0, 1, 3, 4)).reshape(2 * h, 2 * w, c, n)


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _maxpool_fwd_kernel(x_ref, m_ref):
    m_ref[...] = _pool2x2(x_ref[...], jnp.max)


def _maxpool_bwd_kernel(x_ref, m_ref, g_ref, gx_ref):
    # fp32 throughout: v5e Mosaic rejects bf16 vector compares, and the
    # cnt division is more accurate in fp32 anyway.
    x = x_ref[...].astype(jnp.float32)
    um = _up2x2(m_ref[...].astype(jnp.float32))
    mask = (x == um).astype(jnp.float32)
    cnt = _pool2x2(mask, jnp.sum)                     # ties per window (>= 1)
    scale = g_ref[...].astype(jnp.float32) / cnt
    gx_ref[...] = (mask * _up2x2(scale)).astype(gx_ref.dtype)


def _upsample_fwd_kernel(x_ref, y_ref):
    y_ref[...] = _up2x2(x_ref[...])


def _upsample_bwd_kernel(g_ref, gx_ref):
    # Accumulate the 2x2 window sum in fp32 (one final rounding, matching
    # XLA's reduction of the broadcast-based fallback) instead of chaining
    # bf16 partial sums.
    gx_ref[...] = _pool2x2(g_ref[...].astype(jnp.float32),
                           jnp.sum).astype(gx_ref.dtype)


def _call(kernel, ins, out_hw_scale, scale_max, interpret):
    """pallas_call on (H, W, C, N) views: grid over (H, N), full (W, C).

    ins: list of (array, hw_scale) where hw_scale relates the array's
    spatial dims to the FIRST input's (h, w). `out_hw_scale` likewise for
    the single output; `scale_max` is the largest scale among all operands
    (the VMEM budget is set against that block).
    """
    h, w, c, n = ins[0][0].shape
    bh, bc, bn = _tiles(h, w, c, n, ins[0][0].dtype.itemsize, scale_max)
    grid = (h // bh, pl.cdiv(c, bc), pl.cdiv(n, bn))

    def spec(s):
        return pl.BlockSpec((int(bh * s), int(w * s), bc, bn),
                            lambda i, j, k: (i, 0, j, k),
                            memory_space=pltpu.VMEM)

    s = out_hw_scale
    out_shape = jax.ShapeDtypeStruct((int(h * s), int(w * s), c, n),
                                     ins[0][0].dtype)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(si) for _, si in ins],
        out_specs=spec(s),
        out_shape=out_shape,
        interpret=interpret,
    )(*[a for a, _ in ins])


def _t_in(x):   # NHWC -> (H, W, C, N): bitcast for batch-minor layouts
    return jnp.transpose(x, (1, 2, 3, 0))


def _t_out(x):  # (H, W, C, N) -> NHWC
    return jnp.transpose(x, (3, 0, 1, 2))


# ---------------------------------------------------------------------------
# public ops with custom VJP (NHWC in/out)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def max_pool2x2(x, interpret=False):
    """2x2/stride-2 max pool, NHWC, H and W even. One HBM pass fwd and bwd."""
    return _t_out(_call(_maxpool_fwd_kernel, [(_t_in(x), 1)],
                        0.5, 1, interpret))


def _max_pool2x2_fwd(x, interpret):
    m = max_pool2x2(x, interpret)
    return m, (x, m)


def _max_pool2x2_bwd(interpret, res, g):
    x, m = res
    gx = _call(_maxpool_bwd_kernel,
               [(_t_in(x), 1), (_t_in(m), 0.5), (_t_in(g), 0.5)],
               1, 1, interpret)
    return (_t_out(gx),)


max_pool2x2.defvjp(_max_pool2x2_fwd, _max_pool2x2_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def upsample2x(x, interpret=False):
    """2x nearest-neighbor upsample, NHWC. One HBM pass fwd and bwd."""
    return _t_out(_call(_upsample_fwd_kernel, [(_t_in(x), 1)],
                        2, 2, interpret))


def _upsample2x_fwd(x, interpret):
    return upsample2x(x, interpret), None


def _upsample2x_bwd(interpret, _res, g):
    gx = _call(_upsample_bwd_kernel, [(_t_in(g), 1)], 0.5, 1, interpret)
    return (_t_out(gx),)


upsample2x.defvjp(_upsample2x_fwd, _upsample2x_bwd)
