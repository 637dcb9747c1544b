#!/usr/bin/env python
"""A/B: SRVP_BN_STATS=affine_vjp (closed-form BN-stats backward) vs autodiff.

Round-3 profiling attributed ~13.6% of the pre-rewrite KTH step to the
BatchNorm backward; commit 66ac919 built the closed-form VJP behind an env
flag but landed it unmeasured. This script produces the keep-or-kill
evidence on real hardware in one run:

  1. full-dims fp32 grad parity: one train-step gradient under each flag on
     the same batch/state, reporting the max relative leaf difference;
  2. bf16 step time: N timed steps per flag (fresh jit per flag — the env
     var is read at trace time), reporting ms/step and frames/s/chip.

    python scripts/ab_bn_stats.py kth [--steps 30]

Prints one JSON line. Reference context: BN in every conv block
(/root/reference/module/conv.py:81-107).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from scripts.bench_step import CONFIGS  # noqa: E402


def build(cfg_name, dtype_name, batch_slice=None):
    import jax
    import jax.numpy as jnp
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig
    from srvp_tpu.parallel import make_mesh, replicated, shard_batch

    kwargs, nt_cond, seq_len, batch, oversampling = CONFIGS[cfg_name]
    cfg = SRVPConfig(**kwargs)
    hp = train_lib.TrainHParams(nt_cond=nt_cond, oversampling=oversampling,
                                compute_dtype=getattr(jnp, dtype_name))
    mesh = make_mesh()
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    ts = jax.device_put(ts, replicated(mesh))
    step = train_lib.make_train_step(cfg, hp)
    if batch_slice:
        batch = min(batch, batch_slice)
    x = shard_batch(mesh, jnp.asarray(
        np.random.RandomState(0).rand(seq_len, batch, 64, 64,
                                      kwargs["nc"]).astype(np.float32)))
    return ts, step, x, seq_len * batch


def grads_once(cfg_name, flag):
    """Params after ONE fp32 train step (captures the gradient through the
    Adam update deterministically).

    Full MODEL dims, 16-video batch slice: parity only needs determinism,
    and the kth batch-100 config does not fit in HBM at fp32 (18.76G needed
    vs 15.75G — same measurement as bench.golden_loss_step2)."""
    import jax
    _set_flag(flag)
    ts, step, x, _ = build(cfg_name, "float32", batch_slice=16)
    ts, metrics = step(ts, x)
    return jax.device_get(ts.params), float(metrics["loss"])


def time_steps(cfg_name, flag, steps):
    _set_flag(flag)
    ts, step, x, frames = build(cfg_name, "bfloat16")
    for _ in range(5):
        ts, metrics = step(ts, x)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, metrics = step(ts, x)
    float(metrics["loss"])
    sec = (time.perf_counter() - t0) / steps
    return {"ms_per_step": round(sec * 1e3, 2),
            "frames_per_sec_per_chip": round(frames / sec, 1)}


def _set_flag(flag):
    if flag:
        os.environ["SRVP_BN_STATS"] = flag
    else:
        os.environ.pop("SRVP_BN_STATS", None)


def max_rel_diff(a, b):
    import jax
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    worst = 0.0
    for la, lb in zip(leaves_a, leaves_b):
        la, lb = np.asarray(la, np.float64), np.asarray(lb, np.float64)
        denom = np.maximum(np.abs(la), 1e-6)
        worst = max(worst, float(np.max(np.abs(la - lb) / denom)))
    return worst


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=sorted(CONFIGS))
    p.add_argument("--steps", type=int, default=30)
    a = p.parse_args()

    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    import jax

    # 1. fp32 grad parity at full dims (one deterministic step per flag)
    p_default, loss_default = grads_once(a.config, None)
    p_affine, loss_affine = grads_once(a.config, "affine_vjp")
    parity = {"fp32_loss_default": loss_default,
              "fp32_loss_affine_vjp": loss_affine,
              "max_rel_param_diff_after_1_step": max_rel_diff(
                  p_default, p_affine)}

    # 2. bf16 step time per flag
    out = {"config": a.config, "backend": jax.default_backend(),
           "device_kind": jax.devices()[0].device_kind,
           "steps": a.steps, "parity": parity,
           "default": time_steps(a.config, None, a.steps),
           "affine_vjp": time_steps(a.config, "affine_vjp", a.steps)}
    out["speedup"] = round(out["default"]["ms_per_step"]
                           / out["affine_vjp"]["ms_per_step"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
