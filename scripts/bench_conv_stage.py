#!/usr/bin/env python
"""Hardware timing: whole-stage Pallas conv block vs XLA's equivalent chain.

Measures y, stats = conv3x3(act(x*scale+shift)) + batch stats at the
KTH/vgg workhorse shape (64->64ch @ 64x64, folded batch 2048, bf16).

Methodology: the axon tunnel adds ~4 ms per dispatched call and
block_until_ready does not block, so K applications are CHAINED INSIDE one
jit (y feeds the next input; requires cin == cout) and timed with a single
value fetch: per-call time = total / K. This is the go/no-go gate from
docs/DESIGN.md (XLA's in-step fused conv+stats: ~5.6-5.9 ms, 56% MFU).

    python scripts/bench_conv_stage.py --bh 1 [--inner 10] [--feature flags]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

from srvp_tpu.ops.pallas.conv_stage import LEAKY_SLOPE, conv3x3_block_fwd
from bench import PEAK_FLOPS  # per-device-kind bf16 peaks (repo root)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--c", type=int, default=64, help="cin == cout (chained)")
    p.add_argument("--hw", type=int, default=64)
    p.add_argument("--n", type=int, default=2048)
    p.add_argument("--bh", type=int, default=1)
    p.add_argument("--bn", type=int, default=128)
    p.add_argument("--inner", type=int, default=10,
                   help="chain depth: inner+1 kernel applications run "
                        "inside one jit (per-call time = total/(inner+1))")
    p.add_argument("--reps", type=int, default=3,
                   help="timed repetitions; best-of is reported (>= 1)")
    p.add_argument("--transform", action="store_true",
                   help="apply the per-channel normalize on load")
    p.add_argument("--act", default="leaky_relu",
                   choices=["leaky_relu", "tanh", "none"])
    p.add_argument("--no_double_buffer", action="store_true")
    p.add_argument("--no_edge_exact", action="store_true")
    p.add_argument("--no_packed", action="store_true",
                   help="9 separate K=cin matmuls instead of one K=9*cin")
    p.add_argument("--xla", action="store_true", help="time the XLA leg too")
    p.add_argument("--xla_only", action="store_true",
                   help="skip the Pallas leg (re-measure XLA alone)")
    p.add_argument("--vmem_kib", type=int, default=0)
    a = p.parse_args()
    if a.reps < 1:
        p.error("--reps must be >= 1")

    key = jax.random.PRNGKey(0)
    c = a.c
    x = jax.random.normal(key, (c, a.hw, a.hw, a.n), dtype=jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, c, c), dtype=jnp.bfloat16) * 0.04
    scale = 0.9 * jnp.ones((c,), jnp.float32) if a.transform else None
    shift = 0.01 * jnp.ones((c,), jnp.float32) if a.transform else None

    def block(x):
        return conv3x3_block_fwd(
            x, w, scale=scale, shift=shift, act=a.act, bh=a.bh, bn=a.bn,
            double_buffer=not a.no_double_buffer,
            edge_exact=not a.no_edge_exact, packed=not a.no_packed)

    def make_chain(block_fn):
        # stats are summed into a carried accumulator so no iteration's
        # stats computation can be dead-code-eliminated (both legs must pay
        # for conv AND stats every application for a fair comparison)
        def chain(x0):
            def body(_, carry):
                y, acc = carry
                y2, st = block_fn(y)
                return y2, acc + st
            _, acc = lax.fori_loop(0, a.inner + 1, body,
                                   (x0, jnp.zeros((c, 2), jnp.float32)))
            return acc
        return chain

    def time_chain(block_fn, x0, label, compile_opts=None):
        """One harness for both legs: jit the (inner+1)-deep chain, warm up,
        report best-of-reps per-application time."""
        fn = jax.jit(make_chain(block_fn))
        if compile_opts:
            fn = fn.lower(x0).compile(compile_opts)
        float(fn(x0).sum())
        per_call = []
        for _ in range(a.reps):
            t0 = time.perf_counter()
            float(fn(x0).sum())
            per_call.append((time.perf_counter() - t0) / (a.inner + 1))
        dt = min(per_call)
        mfu = (f"  ({flops/dt/peak*100:.0f}% MFU)" if peak else
               "  (MFU n/a: unknown device kind)")
        print(f"{label} {dt*1e3:.3f} ms/block  {flops/dt/1e12:.1f} TFLOP/s"
              + mfu)

    peak = PEAK_FLOPS.get(jax.devices()[0].device_kind, {}).get("bfloat16")
    flops = 2 * 9 * c * c * a.hw * a.hw * a.n
    if not a.xla_only:
        opts = {"xla_tpu_scoped_vmem_limit_kib": str(a.vmem_kib)} \
            if a.vmem_kib else None
        time_chain(
            block, x,
            f"pallas[{'D' if not a.no_double_buffer else '-'}"
            f"{'E' if not a.no_edge_exact else '-'}"
            f"{'T' if a.transform else '-'}"
            f"{'P' if not a.no_packed else '-'} act={a.act} bh={a.bh}]",
            compile_opts=opts)

    if not (a.xla or a.xla_only):
        return

    def xla_block(xn):
        z = xn
        if a.transform:
            z = z.astype(jnp.float32) * scale + shift
        if a.act == "leaky_relu":
            z = jnp.maximum(z, LEAKY_SLOPE * z)
        elif a.act == "tanh":
            z = jnp.tanh(z)
        y = lax.conv_general_dilated(
            z.astype(xn.dtype), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        yf = y.astype(jnp.float32)
        st = jnp.stack([yf.sum((0, 1, 2)), (yf * yf).sum((0, 1, 2))], 1)
        return y, st

    xn = jnp.transpose(x, (3, 1, 2, 0))
    time_chain(xla_block, xn, f"xla   [T={a.transform} act={a.act}]")


if __name__ == "__main__":
    main()
