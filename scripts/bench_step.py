#!/usr/bin/env python
"""Times one jitted train step for a named config, optionally tracing it.

Usage:
    python scripts/bench_step.py kth            # time the KTH vgg step
    python scripts/bench_step.py smmnist --profile /tmp/trace
    python scripts/xplane_summary.py /tmp/trace  # then inspect

Configs mirror the reference training commands (/root/reference/README.md
training section): flagship SMMNIST (dcgan) and KTH / BAIR / Human (vgg,
skipco).
"""

import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    # name: (model kwargs, nt_cond, seq_len, batch, oversampling)
    "smmnist": (dict(nx=64, nc=1, nf=64, nhx=128, ny=20, nz=20, skipco=False,
                     nt_inf=5, nh_inf=256, nlayers_inf=3, nh_res=512,
                     nlayers_res=4, archi="dcgan"), 5, 15, 128, 1),
    "kth": (dict(nx=64, nc=1, nf=64, nhx=128, ny=50, nz=50, skipco=True,
                 nt_inf=3, nh_inf=256, nlayers_inf=3, nh_res=512,
                 nlayers_res=4, archi="vgg"), 10, 20, 100, 2),
    "bair": (dict(nx=64, nc=3, nf=64, nhx=128, ny=50, nz=50, skipco=True,
                  nt_inf=2, nh_inf=256, nlayers_inf=3, nh_res=512,
                  nlayers_res=4, archi="vgg"), 2, 12, 192, 2),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("config", choices=sorted(CONFIGS))
    p.add_argument("--profile", default=None, metavar="DIR")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--xla_opt", action="append", default=[],
                   metavar="KEY=VAL",
                   help="per-compile XLA option(s) for the step, e.g. "
                        "--xla_opt xla_tpu_scoped_vmem_limit_kib=65536")
    a = p.parse_args()

    import jax
    import jax.numpy as jnp
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig

    kwargs, nt_cond, seq_len, batch, oversampling = CONFIGS[a.config]
    cfg = SRVPConfig(**kwargs)
    on_tpu = jax.default_backend() == "tpu"
    hp = train_lib.TrainHParams(
        nt_cond=nt_cond, oversampling=oversampling,
        compute_dtype=jnp.float32 if (a.fp32 or not on_tpu) else jnp.bfloat16)
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    step = train_lib.make_train_step(cfg, hp)
    x = jnp.asarray(np.random.RandomState(0).rand(
        seq_len, batch, 64, 64, kwargs["nc"]).astype(np.float32))
    if a.xla_opt:
        opts = dict(kv.split("=", 1) for kv in a.xla_opt)
        step = step.lower(ts, x).compile(opts)
        print(f"compiled with {opts}")

    for _ in range(3):
        ts, metrics = step(ts, x)
    float(metrics["loss"])

    if a.profile:
        jax.profiler.start_trace(a.profile)
    t0 = time.perf_counter()
    for _ in range(a.steps):
        ts, metrics = step(ts, x)
    loss = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / a.steps
    if a.profile:
        jax.profiler.stop_trace()

    frames = seq_len * batch
    print(f"{a.config}: {dt*1e3:.2f} ms/step, {frames/dt:,.0f} frames/s "
          f"(batch {batch} x seq {seq_len}), loss={loss:.1f}")


if __name__ == "__main__":
    main()
