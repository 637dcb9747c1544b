#!/usr/bin/env python
"""XLA compiler-options sweep for the train step: measure whether any
compiler knob beats the default configuration on the benchmark shapes.

Channel: per-compile PJRT `compiler_options` (via jax.jit) read from the
SRVP_COMPILER_OPTIONS env var by `make_train_step`. XLA_FLAGS is NOT usable
here: under the tunneled axon TPU platform the local XLA client parses
XLA_FLAGS and aborts on TPU-only flags it does not know
(parse_flags_from_env.cc fatal — measured round 3); compiler_options travel
through PJRT to the remote TPU compiler and are verified working on
hardware.

Each leg runs in a fresh subprocess reusing bench.bench_ours as the timing
harness (same chained-step methodology; dispatch overhead excluded by
construction). Each leg's result is appended to sweep_xla_flags.json as it
lands, so a timeout keeps partial results. Unknown/invalid options fail only
their own leg.

Usage: python scripts/sweep_xla_flags.py [config] [steps]
  config: bench config name (default kth-vgg)
  steps:  timed steps per leg (default 20)

Rationale: every *code-level* rewrite of the step measured slower than
XLA's layout equilibrium (docs/DESIGN.md round-2/3 records); compiler
configuration is the one untried lever. Options touch scheduling and fusion
sizing only — numerics-affecting options (conv precision etc.) are excluded.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "sweep_xla_flags.json")

# name -> compiler_options dict (shipped to the leg via SRVP_COMPILER_OPTIONS).
# Values are typed: PJRT option parsing rejects e.g. the string "false" for a
# bool option, so bools/ints must be JSON bools/ints.
LEGS = {
    "baseline": {},
    "scoped_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": 65536},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": 98304},
    "no_latency_hiding_sched":
        {"xla_tpu_enable_latency_hiding_scheduler": False},
    "no_rwb_fusion": {"xla_tpu_rwb_fusion": False},
    "scoped_vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": 131072},
}

LEG_SRC = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from srvp_tpu.utils.runtime import setup_compilation_cache
setup_compilation_cache()
import bench
bench.WARMUP = int(os.environ.get("SRVP_SWEEP_WARMUP", bench.WARMUP))
fps, info = bench.bench_ours({cfg!r}, steps={steps})
print("LEGRESULT " + json.dumps({{"fps": fps, **info}}))
"""


def run_leg(name, options, cfg, steps):
    env = dict(os.environ)
    if options:
        env["SRVP_COMPILER_OPTIONS"] = json.dumps(options)
    else:
        env.pop("SRVP_COMPILER_OPTIONS", None)
    # Distinct cache dir per leg: option-specific binaries never collide with
    # the shared default cache.
    env["SRVP_TPU_JAX_CACHE"] = os.path.join(
        os.path.expanduser("~"), ".cache", f"srvp_sweep_{name}")
    proc = subprocess.run(
        [sys.executable, "-c", LEG_SRC.format(repo=REPO, cfg=cfg, steps=steps)],
        capture_output=True, text=True, timeout=1800, env=env)
    for line in proc.stdout.splitlines():
        if line.startswith("LEGRESULT "):
            return json.loads(line[len("LEGRESULT "):])
    return {"error": (proc.stderr or proc.stdout)[-2000:], "rc": proc.returncode}


def main():
    cfg = sys.argv[1] if len(sys.argv) > 1 else "kth-vgg"
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    results = {}
    for name, options in LEGS.items():
        print(f"--- {name}: {options or '(ambient defaults)'}", flush=True)
        try:
            res = run_leg(name, options, cfg, steps)
        except subprocess.TimeoutExpired:
            res = {"error": "timeout"}
        results[name] = {"options": options, **res}
        if "sec_per_step" in res:
            print(f"    {res['sec_per_step']*1e3:.1f} ms/step "
                  f"(mfu {res.get('mfu')})", flush=True)
        else:
            print(f"    FAILED: {str(res.get('error'))[:200]}", flush=True)
        with open(OUT, "w") as f:
            json.dump({"config": cfg, "steps": steps, "legs": results}, f,
                      indent=1)
    base = results.get("baseline", {}).get("sec_per_step")
    if base:
        for name, r in sorted(results.items(),
                              key=lambda kv: kv[1].get("sec_per_step", 9e9)):
            if "sec_per_step" in r:
                print(f"{name:32s} {r['sec_per_step']*1e3:8.1f} ms "
                      f"({r['sec_per_step']/base:5.2f}x baseline)")


if __name__ == "__main__":
    main()
