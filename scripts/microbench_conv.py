#!/usr/bin/env python
"""Microbenchmark: Pallas fused conv(3x3,s1)+BN-stats kernel vs XLA's conv.

Decision experiment for the fused conv-block path: XLA compiles the vgg
workhorse conv (64->64ch @ 64x64, N=2000, bf16) + fused batch-stat
reduction into one ~5.9 ms fusion (measured, scripts/bench_step.py kth
profile). A Pallas replacement only makes sense if this kernel can match
that while ALSO absorbing the pre-normalize+activation of its input (which
XLA emits as separate full-tensor passes).

Formulation (channel-major activation layout (C, H, W, N)):
    for each tap (dy, dx):  acc[cout, X*n] += W2[cout, cin] @ xs[cin, X*n]
with X = rows-per-block x W. The N dim rides the lanes (128), W the
sublanes, so tap shifts touch only major dims (h) and sublanes (w).
Halo rows are loaded via manual double-buffered DMA from HBM.
"""

import argparse
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv_bn_kernel(x_hbm, w_ref, y_ref, stats_ref, acc_ref, xbuf, sem,
                   *, bh, cin, cout, h, w, n, bn):
    """Grid: (h // bh, n // bn). x_hbm: (cin, h, w, n) in ANY/HBM.

    Per step: DMA a (cin, bh+2, w, bn) halo slab (row range clamped at the
    image edges — the microbenchmark skips exact edge semantics), 9-tap
    matmul accumulate, write the y block (cout, bh, w, bn), accumulate
    channel sums/sumsq, flush stats on the last step.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    row0 = jnp.clip(i * bh - 1, 0, h - (bh + 2))
    copy = pltpu.make_async_copy(
        x_hbm.at[:, pl.ds(row0, bh + 2), :, pl.ds(j * bn, bn)],
        xbuf,
        sem,
    )
    copy.start()
    copy.wait()

    x = xbuf[...]  # (cin, bh+2, w, bn)

    acc = jnp.zeros((cout, bh * w * bn), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            xs = x[:, dy:dy + bh, :, :]
            if dx == 0:  # output col c reads input col c-1: shift right
                xs = jnp.pad(xs[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
            elif dx == 2:  # output col c reads input col c+1: shift left
                xs = jnp.pad(xs[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
            acc += lax.dot_general(
                w_ref[dy, dx], xs.reshape(cin, bh * w * bn),
                (((0,), (0,)), ((), ())),  # contract cin; w is (cin, cout)
                preferred_element_type=jnp.float32,
            )
    acc = acc.reshape(cout, bh * w, bn)
    y_ref[...] = acc.astype(y_ref.dtype).reshape(cout, bh, w, bn)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # keep reductions 2-D end to end: Mosaic rejects rank-1 vector layouts
    acc2 = acc.reshape(cout, bh * w * bn)
    s1 = jnp.sum(acc2, axis=1, keepdims=True)           # (cout, 1)
    s2 = jnp.sum(acc2 * acc2, axis=1, keepdims=True)    # (cout, 1)
    acc_ref[...] += jnp.concatenate([s1, s2], axis=1)   # (cout, 2)

    @pl.when(jnp.logical_and(i == pl.num_programs(0) - 1,
                             j == pl.num_programs(1) - 1))
    def _flush():
        stats_ref[...] = acc_ref[...]


def fused_conv_bn(x, w, bh=8, bn=256, interpret=False):
    cin, h, ww, n = x.shape
    cout = w.shape[-1]
    grid = (h // bh, n // bn)
    kernel = functools.partial(
        conv_bn_kernel, bh=bh, cin=cin, cout=cout, h=h, w=ww, n=n, bn=bn)
    return pl.pallas_call(
        kernel,
        interpret=interpret,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),   # x stays in HBM
            pl.BlockSpec((3, 3, cin, cout), lambda i, j: (0, 0, 0, 0),
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
            pltpu.VMEM((cin, bh + 2, ww, bn), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(x, w)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--cin", type=int, default=64)
    p.add_argument("--cout", type=int, default=64)
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--bh", type=int, default=8)
    p.add_argument("--bn", type=int, default=256)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode (CPU correctness check).")
    a = p.parse_args()

    n = (a.n // a.bn) * a.bn
    key = jax.random.PRNGKey(0)
    dt_x = jnp.float32 if a.interpret else jnp.bfloat16
    x = jax.random.normal(key, (a.cin, a.hw, a.hw, n), dtype=dt_x)
    w = jax.random.normal(key, (3, 3, a.cin, a.cout), dtype=dt_x) * 0.05

    f = jax.jit(lambda x, w: fused_conv_bn(x, w, a.bh, a.bn, a.interpret))
    y, stats = f(x, w)
    y.block_until_ready()

    # correctness vs XLA (NHWC reference), interior only
    x_nhwc = jnp.transpose(x, (3, 1, 2, 0))
    ref = lax.conv_general_dilated(
        x_nhwc, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = jnp.transpose(y, (3, 1, 2, 0))
    # the clamped-halo scaffold is wrong across the first/last ROW BLOCK
    # (edge semantics are deferred to the real kernel); columns are exact
    c = a.bh
    err = jnp.abs(got[:, c:-c, :].astype(jnp.float32)
                  - ref[:, c:-c, :].astype(jnp.float32)).max()
    print(f"interior (rows {c}:-{c}) max err:", float(err))

    t0 = time.perf_counter()
    for _ in range(a.steps):
        y, stats = f(x, w)
    float(stats.sum())
    dt = (time.perf_counter() - t0) / a.steps
    flops = 2 * 9 * a.cin * a.cout * a.hw * a.hw * n
    print(f"pallas: {dt*1e3:.3f} ms  {flops/dt/1e12:.1f} TFLOP/s "
          f"({flops/dt/197e12*100:.0f}% MFU)")

    def xla_conv(xn, w):
        y = lax.conv_general_dilated(
            xn, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yf = y.astype(jnp.float32)
        return y, jnp.stack([yf.sum((0, 1, 2)), (yf * yf).sum((0, 1, 2))])
    g = jax.jit(xla_conv)
    y2, s2 = g(x_nhwc, w)
    y2.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(a.steps):
        y2, s2 = g(x_nhwc, w)
    float(s2.sum())
    dt2 = (time.perf_counter() - t0) / a.steps
    print(f"xla:    {dt2*1e3:.3f} ms  {flops/dt2/1e12:.1f} TFLOP/s "
          f"({flops/dt2/197e12*100:.0f}% MFU)")


if __name__ == "__main__":
    main()
