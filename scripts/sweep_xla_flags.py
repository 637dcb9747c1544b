#!/usr/bin/env python
"""XLA_FLAGS sweep for the train step: measure whether any compiler knob
beats the default configuration on the benchmark shapes.

XLA flags are read once at process init, so every leg runs in a fresh
subprocess reusing bench.bench_ours as the timing harness (same chained-step
methodology; dispatch overhead excluded by construction). Each leg's result
is appended to sweep_xla_flags.json as it lands, so a timeout keeps partial
results. Unknown/invalid flags fail only their own leg.

Usage: python scripts/sweep_xla_flags.py [config] [steps]
  config: bench config name (default kth-vgg)
  steps:  timed steps per leg (default 20)

Rationale: every *code-level* rewrite of the step measured slower than
XLA's layout equilibrium (docs/DESIGN.md round-2/3 records); compiler
configuration is the one untried lever. Flags touch scheduling and fusion
sizing only — numerics-affecting flags (conv precision etc.) are excluded.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "sweep_xla_flags.json")

# name -> XLA_FLAGS string (appended to any ambient flags)
LEGS = {
    "baseline": "",
    "scoped_vmem_64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "scoped_vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "no_latency_hiding_sched":
        "--xla_tpu_enable_latency_hiding_scheduler=false",
    "no_rwb_fusion": "--xla_tpu_rwb_fusion=false",
    "scoped_vmem_128m": "--xla_tpu_scoped_vmem_limit_kib=131072",
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


def run_leg(name, flags, cfg, steps):
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    # Distinct cache dir per leg: flag-specific binaries never collide with
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
    for name, flags in LEGS.items():
        print(f"--- {name}: {flags or '(ambient defaults)'}", flush=True)
        try:
            res = run_leg(name, flags, cfg, steps)
        except subprocess.TimeoutExpired:
            res = {"error": "timeout"}
        results[name] = {"flags": flags, **res}
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
