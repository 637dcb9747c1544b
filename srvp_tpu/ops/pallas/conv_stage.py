"""Whole-stage Pallas conv path: fused [pre-normalize+act] -> conv3x3 -> stats.

The round-2 finding (docs/DESIGN.md) was that XLA's conv fusions run at ~67%
of roofline and every LOCAL op rewrite loses to its layout equilibrium; the
only remaining lever is owning the whole VGG stage data path. This module
implements that ownership for the 3x3 stride-1 conv blocks that dominate the
KTH/vgg step (reference hot path /root/reference/module/conv.py:182-224):

    x_raw  --[scale,shift,leaky]-->  x_act  --conv3x3-->  y_raw, stats(y_raw)

* Activations live CHANNEL-MAJOR: (C, H, W, N) with the folded batch N on
  the lanes (128), W on sublanes. Successive blocks consume each other's
  RAW (pre-BN) outputs; the BatchNorm normalize + LeakyReLU of the previous
  block is applied on the fly while loading the conv input — the full-tensor
  normalize/activation passes XLA emits disappear into the conv's memory
  traffic.
* Batch statistics (sum, sum of squares) of the raw conv output are
  accumulated in-kernel into a (cout, 2) fp32 output — the train-mode BN
  stats of THIS block, consumed as (scale, shift) by the next block's
  invocation. Columns >= n_valid (batch padding up to a lane multiple) are
  excluded from the statistics.
* The input slab (with a one-row halo on each side) is streamed from HBM by
  a double-buffered manual DMA pipeline; edge row blocks zero their
  out-of-image halo rows exactly (padding=1 conv semantics).
* 9 taps x one MXU matmul per tap: acc[cout, bh*W*bn] += W[dy,dx]^T @ x_tap.

FORWARD-ONLY, and deliberately not routed into the model: hardware
measurements (scripts/bench_conv_stage.py; docs/DESIGN.md "Round-3
whole-stage Pallas verdict") put this kernel at 17.6-18.7 ms on the
64ch/64x64/N=2048 workhorse vs ~5.9 ms for XLA's in-step conv+stats
fusion — the im2col taps must be materialized as explicit VPU copies
inside Mosaic and cout=64 caps the MXU at half width, so the XLA
equilibrium stands. Kept with its exactness tests as the recorded
evidence for that conclusion.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LEAKY_SLOPE = 0.2  # reference LeakyReLU slope, module/conv.py make_conv_block


def _fwd_kernel(x_hbm, w_ref, scale_ref, shift_ref, y_ref, stats_ref,
                acc_ref, xbuf, sems, *, bh, cin, cout, h, w, n, bn,
                n_valid, transform, act, double_buffer=True,
                edge_exact=True, stats_mask=True, packed=True):
    """Grid: (h // bh, n // bn), row-major (j fastest).

    xbuf: (2, cin, bh + 2, w, bn) double-buffered input slabs. Edge row
    blocks DMA only the valid rows and zero the out-of-image halo row.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)
    step = i * nj + j

    def _copy(ii, jj, slot, fire):
        """Edge-exact: 3 statically-sized DMA variants (sizes must be
        static; only the start row / dst offset are traced): top block
        loads bh+1 rows into dst offset 1, bottom loads bh+1 into offset 0,
        interior loads bh+2. xbuf row r always holds absolute row
        (ii*bh - 1 + r); the halo rows that stay unwritten at the image
        edges are masked to zero by the kernel body. Requires ni >= 2.

        Non-edge-exact (bench bisect only): one clamped bh+2-row DMA —
        wrong across the first/last row block."""
        def mk(row_lo, dst_lo, rows):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(row_lo, rows), :, pl.ds(jj * bn, bn)],
                xbuf.at[slot, :, pl.ds(dst_lo, rows)],
                sems.at[slot],
            )

        if not edge_exact:
            fire(mk(jnp.clip(ii * bh - 1, 0, h - (bh + 2)), 0, bh + 2))
            return

        @pl.when(ii == 0)
        def _top():
            fire(mk(0, 1, bh + 1))

        @pl.when(jnp.logical_and(ii > 0, ii < ni - 1))
        def _mid():
            fire(mk(ii * bh - 1, 0, bh + 2))

        @pl.when(ii == ni - 1)
        def _bot():
            fire(mk(ii * bh - 1, 0, bh + 1))

    def start_copy(ii, jj, slot):
        _copy(ii, jj, slot, lambda c: c.start())

    def wait_copy(ii, slot):
        _copy(ii, 0, slot, lambda c: c.wait())

    if double_buffer:
        slot = lax.rem(step, 2)

        @pl.when(step == 0)
        def _warmup():
            start_copy(i, j, slot)

        @pl.when(step + 1 < ni * nj)
        def _prefetch():
            step1 = step + 1
            start_copy(step1 // nj, lax.rem(step1, nj), 1 - slot)

        wait_copy(i, slot)
        x = xbuf[slot]  # (cin, bh + 2, w, bn)
    else:
        start_copy(i, j, 0)
        wait_copy(i, 0)
        x = xbuf[0]
    if transform:
        x = x * scale_ref[:, :1].reshape(cin, 1, 1, 1) \
            + shift_ref[:, :1].reshape(cin, 1, 1, 1)
    if act == "leaky_relu":
        x = jnp.maximum(x, LEAKY_SLOPE * x)
    elif act == "tanh":
        x = jnp.tanh(x)
    x = x.astype(y_ref.dtype)
    if edge_exact:
        # zero the out-of-image halo rows of edge blocks (exact padding=1)
        row_ids = lax.broadcasted_iota(jnp.int32, (cin, bh + 2, w, bn), 1) \
            + i * bh - 1
        x = jnp.where((row_ids >= 0) & (row_ids < h), x, 0)

    def tap(dy, dx):
        xs = x[:, dy:dy + bh, :, :]
        if dx == 0:  # output col c reads input col c-1: shift right
            xs = jnp.pad(xs[:, :, :-1, :],
                         ((0, 0), (0, 0), (1, 0), (0, 0)))
        elif dx == 2:  # output col c reads input col c+1: shift left
            xs = jnp.pad(xs[:, :, 1:, :],
                         ((0, 0), (0, 0), (0, 1), (0, 0)))
        return xs.reshape(cin, bh * w * bn)

    if packed:
        # single K = 9*cin contraction: a K=cin matmul only half-fills the
        # 128-deep MXU at cin=64; stacking the 9 taps (tap-major, matching
        # w.reshape(9*cin, cout)) restores full systolic depth.
        xcat = jnp.concatenate(
            [tap(dy, dx) for dy in range(3) for dx in range(3)], axis=0)
        acc = lax.dot_general(
            w_ref[...], xcat,
            (((0,), (0,)), ((), ())),  # w_ref is (9*cin, cout)
            preferred_element_type=jnp.float32,
        )
    else:
        acc = jnp.zeros((cout, bh * w * bn), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                acc += lax.dot_general(
                    w_ref[dy, dx], tap(dy, dx),
                    (((0,), (0,)), ((), ())),  # w is (cin, cout)
                    preferred_element_type=jnp.float32,
                )
    y_ref[...] = acc.astype(y_ref.dtype).reshape(cout, bh, w, bn)

    @pl.when(step == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # batch statistics over valid columns only (batch padding masked out);
    # all reductions stay 2-D (Mosaic rejects rank-1 vector layouts)
    if stats_mask and n_valid < n:
        acc3 = acc.reshape(cout, bh * w, bn)
        col = lax.broadcasted_iota(jnp.int32, (cout, bh * w, bn), 2) + j * bn
        acc2 = jnp.where(col < n_valid, acc3, 0.0).reshape(
            cout, bh * w * bn)
    else:
        acc2 = acc.reshape(cout, bh * w * bn)
    s1 = jnp.sum(acc2, axis=1, keepdims=True)
    s2 = jnp.sum(acc2 * acc2, axis=1, keepdims=True)
    acc_ref[...] += jnp.concatenate([s1, s2], axis=1)

    @pl.when(step == ni * nj - 1)
    def _flush():
        stats_ref[...] = acc_ref[...]


def conv3x3_block_fwd(x, w, scale=None, shift=None, act="leaky_relu",
                      n_valid=None, bh=2, bn=128, interpret=False,
                      double_buffer=True, edge_exact=True, stats_mask=True,
                      packed=True):
    """One fused VGG block forward on channel-major activations.

    x: (cin, h, w, n) raw (pre-BN) activations of the previous block (or
       plain inputs); w: (3, 3, cin, cout); scale/shift: (cin,) fp32
       per-channel normalize applied BEFORE `act` (None = no transform).
    Returns (y_raw (cout, h, w, n) in x.dtype, stats (cout, 2) fp32 =
    [sum, sumsq] of y_raw over the n_valid valid columns and all pixels).
    """
    cin, h, ww, n = x.shape
    cout = w.shape[-1]
    assert h % bh == 0 and n % bn == 0, (h, bh, n, bn)
    assert h // bh >= 2, "need >= 2 row blocks (static-size edge DMAs)"
    n_valid = n if n_valid is None else n_valid
    transform = scale is not None
    if not transform:
        scale = jnp.ones((cin,), jnp.float32)
        shift = jnp.zeros((cin,), jnp.float32)
    # pass per-channel params as (cin, 128) lane-replicated 2-D tensors
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32)[:, None], (cin, 128))
    shift2 = jnp.broadcast_to(shift.astype(jnp.float32)[:, None], (cin, 128))

    kernel = functools.partial(
        _fwd_kernel, bh=bh, cin=cin, cout=cout, h=h, w=ww, n=n, bn=bn,
        n_valid=n_valid, transform=transform, act=act,
        double_buffer=double_buffer, edge_exact=edge_exact,
        stats_mask=stats_mask, packed=packed)
    grid = (h // bh, n // bn)
    n_slots = 2 if double_buffer else 1
    if packed:  # tap-major (dy, dx, cin) rows, matching the kernel's concat
        w = w.reshape(9 * cin, cout)
        w_spec = pl.BlockSpec((9 * cin, cout), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)
    else:
        w_spec = pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # x streamed manually
            w_spec,
            pl.BlockSpec((cin, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cin, 128), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((cout, bh, ww, bn), lambda i, j: (0, i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((cout, h, ww, n), x.dtype),
            jax.ShapeDtypeStruct((cout, 2), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((cout, 2), jnp.float32),
            pltpu.VMEM((n_slots, cin, bh + 2, ww, bn), x.dtype),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w, scale2, shift2)


def bn_scale_shift(stats, gamma, beta, n_valid, hw, eps=1e-5):
    """Batch-stat (scale, shift) for the NEXT block's input transform.

    stats: (c, 2) [sum, sumsq] over count = n_valid * hw elements.
    Returns fp32 (scale, shift) with y_norm = y_raw * scale + shift,
    matching train-mode BatchNorm (biased variance, like torch)."""
    count = n_valid * hw
    mean = stats[:, 0] / count
    var = stats[:, 1] / count - mean * mean
    inv = gamma.astype(jnp.float32) * lax.rsqrt(var + eps)
    return inv, beta.astype(jnp.float32) - mean * inv
