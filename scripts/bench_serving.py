#!/usr/bin/env python
"""Serving-path benchmark: latency and throughput of the exported StableHLO
artifact (srvp_tpu/export.py) on one chip.

Measures the deployed inference path end-to-end exactly as a server would
run it — load the self-contained artifact with `export.load_serving` (no
model code), feed uint8 conditioning frames, time the uint8 frame batches
coming back — at several request batch sizes per flagship config. The
reference has no serving story to compare against (its checkpoints only
feed the torch test protocol, /root/reference/test.py:196-204), so the
numbers here are absolute: frames/s/chip and per-request latency.

    python scripts/bench_serving.py [--configs smmnist-dcgan kth-vgg]
        [--batches 1 16 128] [--iters 20] [--out docs/...json]

Prints one JSON line; weights are random-init at full model dims
(throughput does not depend on weight values).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def bench_one(name, batches, iters, nt_gen=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import CONFIGS
    from srvp_tpu import export as ex
    from srvp_tpu.models import srvp

    c = CONFIGS[name]
    cfg = srvp.SRVPConfig(**c["kwargs"])
    params, bn_state = srvp.init(jax.random.PRNGKey(0), cfg)
    nt_cond = c["nt_cond"]
    # The reference test protocol's horizons: smmnist 25 total frames,
    # kth 30 (README.md:150-171).
    nt_gen = nt_gen or (25 if name.startswith("smmnist") else 30)
    on_tpu = jax.default_backend() == "tpu"
    blob = ex.export_serving(
        cfg, params, bn_state, nt_cond, nt_gen,
        oversampling=c["oversampling"],
        compute_dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        platforms=(jax.default_backend(),))
    path = os.path.join("/tmp", f"bench_serving_{name}.srvpexp")
    ex.save_serving(path, blob)
    fn, hdr = ex.load_serving(path)

    out = {"artifact_bytes": len(blob), "nt_cond": nt_cond,
           "nt_gen": nt_gen, "batches": {}}
    rng = np.random.RandomState(0)
    for b in batches:
        x = rng.randint(0, 256, size=(nt_cond, b, cfg.nx, cfg.nx, cfg.nc),
                        dtype=np.uint8)
        t0 = time.perf_counter()
        y = np.asarray(fn(x, 0))
        compile_s = time.perf_counter() - t0
        assert y.shape == (nt_gen, b, cfg.nx, cfg.nx, cfg.nc), y.shape
        for w in range(2):  # post-compile warmup
            np.asarray(fn(x, w + 1))
        # Two latencies per call: device (H2D + compute, block_until_ready)
        # and e2e (+ materialize the uint8 frames on the host). On a real
        # TPU VM D2H is local PCIe and the two are close; under a tunneled
        # PJRT backend (axon) the frame readback dominates e2e, so record
        # both rather than letting the link speed masquerade as model cost.
        lat_dev, lat = [], []
        for i in range(iters):
            t0 = time.perf_counter()
            y = jax.block_until_ready(fn(x, i))
            t1 = time.perf_counter()
            np.asarray(y)
            t2 = time.perf_counter()
            lat_dev.append(t1 - t0)
            lat.append(t2 - t0)
        p50 = float(np.median(lat))
        p50_dev = float(np.median(lat_dev))
        out["batches"][str(b)] = {
            "latency_p50_ms": round(p50 * 1e3, 2),
            "latency_p95_ms": round(float(np.percentile(lat, 95)) * 1e3, 2),
            "device_latency_p50_ms": round(p50_dev * 1e3, 2),
            "frames_per_sec": round(nt_gen * b / p50, 1),
            "device_frames_per_sec": round(nt_gen * b / p50_dev, 1),
            "first_call_compile_s": round(compile_s, 1),
        }
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--configs", nargs="+",
                   default=["smmnist-dcgan", "kth-vgg"])
    p.add_argument("--batches", nargs="+", type=int, default=[1, 16, 128])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--nt_gen", type=int, default=None)
    p.add_argument("--out", default=None)
    a = p.parse_args()

    from bench import preflight_device
    if not preflight_device():
        sys.exit(3)
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    import jax

    record = {"metric": "serving", "backend": jax.default_backend(),
              "device_kind": jax.devices()[0].device_kind, "configs": {}}
    for name in a.configs:
        record["configs"][name] = bench_one(name, a.batches, a.iters,
                                            nt_gen=a.nt_gen)
    line = json.dumps(record)
    print(line)
    if a.out:
        with open(a.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
