#!/usr/bin/env python
"""Benchmark: SRVP training throughput (frames/sec/chip), ours vs reference.

Prints ONE JSON line:
    {"metric": "train_frames_per_sec_per_chip", "value": N, "unit":
     "frames/s/chip", "vs_baseline": N, ...extra context keys}

The headline value is the flagship Stochastic Moving MNIST training config
(dcgan, ny=nz=20, seq_len 15, batch 128 — reference README.md training
defaults). A `configs` key carries per-config numbers for both benchmark
shapes — smmnist/dcgan and KTH/vgg+skipco — each with ms/step, frames/s/chip,
model FLOP/s and MFU (XLA's own FLOP count of the compiled train step over
the device's peak; v5e peak 197 TFLOP/s bf16).

Baseline context: the reference publishes no throughput numbers and this
machine has no CUDA device, so `vs_baseline` compares against the reference
PyTorch train step (/root/reference/train.py:49-129) measured by this
harness on torch-CPU — a capability statement ("the same step, same shapes,
best available torch backend here"), NOT a GPU comparison. The measured
baseline is cached in bench_baseline.json so later rounds compare against
the same number.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")

STEPS = 50
WARMUP = 5

# name: model kwargs + protocol, mirroring the reference training commands
# (/root/reference/README.md training section).
CONFIGS = {
    "smmnist-dcgan": dict(
        kwargs=dict(nx=64, nc=1, nf=64, nhx=128, ny=20, nz=20, skipco=False,
                    nt_inf=5, nh_inf=256, nlayers_inf=3, nh_res=512,
                    nlayers_res=4, archi="dcgan"),
        nt_cond=5, seq_len=15, batch=128, oversampling=1),
    "kth-vgg": dict(
        kwargs=dict(nx=64, nc=1, nf=64, nhx=128, ny=50, nz=50, skipco=True,
                    nt_inf=3, nh_inf=256, nlayers_inf=3, nh_res=512,
                    nlayers_res=4, archi="vgg"),
        nt_cond=10, seq_len=20, batch=100, oversampling=2),
}

# Peak dense matmul FLOP/s per chip by device kind (bf16 / fp32).
PEAK_FLOPS = {
    "TPU v5 lite": {"bfloat16": 197e12, "float32": 98.5e12},
    "TPU v5e": {"bfloat16": 197e12, "float32": 98.5e12},
    "TPU v4": {"bfloat16": 275e12, "float32": 137.5e12},
    "TPU v6 lite": {"bfloat16": 918e12, "float32": 459e12},
}


def make_batch(cfg_name, seed=0):
    c = CONFIGS[cfg_name]
    return np.random.RandomState(seed).rand(
        c["seq_len"], c["batch"], 64, 64,
        c["kwargs"]["nc"]).astype(np.float32)


def bench_ours(cfg_name, steps=STEPS):
    import jax
    import jax.numpy as jnp
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig
    from srvp_tpu.parallel import make_mesh, replicated, shard_batch

    c = CONFIGS[cfg_name]
    cfg = SRVPConfig(**c["kwargs"])
    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    hp = train_lib.TrainHParams(
        nt_cond=c["nt_cond"], oversampling=c["oversampling"],
        compute_dtype=dtype)
    mesh = make_mesh()
    n_chips = mesh.devices.size
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    ts = jax.device_put(ts, replicated(mesh))
    step = train_lib.make_train_step(cfg, hp)
    x = shard_batch(mesh, jnp.asarray(make_batch(cfg_name)))

    # XLA's FLOP count for one compiled train step (fwd+bwd+Adam).
    try:
        cost = step.lower(ts, x).compile().cost_analysis()
        flops_per_step = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_step = 0.0

    for _ in range(WARMUP):
        ts, metrics = step(ts, x)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(steps):
        ts, metrics = step(ts, x)
    # Fetch the final VALUE: step N's loss depends on step N-1's params, so
    # this forces the whole chain. (block_until_ready alone is not reliable
    # on the tunneled axon platform.)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    sec_per_step = dt / steps
    fps = c["seq_len"] * c["batch"] / sec_per_step / n_chips

    kind = jax.devices()[0].device_kind
    peak = PEAK_FLOPS.get(kind, {}).get(str(jnp.dtype(dtype).name))
    # cost_analysis() on the compiled (partitioned) step reports PER-DEVICE
    # flops — tests/test_train.py::test_sharded_training_scales_per_device_work
    # asserts exactly this — so flops/sec_per_step is already a per-chip rate.
    flops_per_sec = flops_per_step / sec_per_step
    info = {
        "backend": jax.default_backend(), "chips": n_chips, "steps": steps,
        "sec_per_step": round(sec_per_step, 5),
        "loss": float(metrics["loss"]),
        "model_flops_per_step": flops_per_step,
        "model_flops_per_sec_per_chip": round(flops_per_sec, 1),
        "mfu": round(flops_per_sec / peak, 4) if peak else None,
        "device_kind": kind, "compute_dtype": str(jnp.dtype(dtype).name),
    }
    return fps, info


def bench_reference(cfg_name="smmnist-dcgan"):
    """Times the reference torch train step (imported from /root/reference,
    used as a measurement oracle)."""
    if not os.path.isdir("/root/reference"):
        return None, {}
    sys.path.insert(0, "/root/reference")
    try:
        import torch
        import module.srvp as ref_srvp
        import module.utils as ref_utils
        import torch.distributions as distrib

        c = CONFIGS[cfg_name]
        k = c["kwargs"]
        torch.manual_seed(0)
        model = ref_srvp.StochasticLatentResidualVideoPredictor(
            k["nx"], k["nc"], k["nf"], k["nhx"], k["ny"], k["nz"],
            k["skipco"], k["nt_inf"], k["nh_inf"], k["nlayers_inf"],
            k["nh_res"], k["nlayers_res"], k["archi"])
        model.init(res_gain=1.41)
        model.train()
        optimizer = torch.optim.Adam(model.parameters(), lr=3e-4)
        x = torch.from_numpy(
            np.transpose(make_batch(cfg_name), (0, 1, 4, 2, 3))).contiguous()
        seq_len, batch = c["seq_len"], c["batch"]

        def one_step():
            optimizer.zero_grad()
            x_, y, z, _, q_y_0_params, q_z_params, p_z_params, res = model(
                x, seq_len, dt=1.0 / c["oversampling"])
            nll = ref_utils.neg_logprob(x_, x, scale=1.0).sum()
            q_y_0 = ref_utils.make_normal_from_raw_params(q_y_0_params)
            kl_y_0 = distrib.kl_divergence(q_y_0, distrib.Normal(0, 1)).sum()
            q_z = ref_utils.make_normal_from_raw_params(q_z_params)
            p_z = ref_utils.make_normal_from_raw_params(p_z_params)
            kl_z = distrib.kl_divergence(q_z, p_z).sum()
            loss = (nll + kl_y_0 + kl_z
                    + torch.norm(res, p=2, dim=2).sum()) / batch
            loss.backward()
            optimizer.step()
            return float(loss)

        # kth-vgg on torch-CPU runs ~10+ min/step; one warmup + one timed
        # step keeps the one-time baseline measurement tractable (cached
        # in bench_baseline.json afterwards). CPU steps have no jit warmup
        # cliff, so step-to-step variance is small.
        n_steps = 3 if cfg_name == "smmnist-dcgan" else 1
        one_step()  # warmup
        t0 = time.perf_counter()
        for _ in range(n_steps):
            loss = one_step()
        dt = time.perf_counter() - t0
        fps = seq_len * batch * n_steps / dt
        dev = "cuda" if torch.cuda.is_available() else "cpu"
        return fps, {"backend": f"torch-{dev}", "sec_per_step": dt / n_steps,
                     "loss": loss}
    finally:
        sys.path.remove("/root/reference")


def get_baseline():
    """Reference torch-CPU throughput, measured once PER CONFIG and cached.

    Cache layout: {cfg_name: {"train_frames_per_sec": fps, ...info}}. A
    legacy single-config cache (round <=2 wrote the smmnist-dcgan record at
    top level) is upgraded in place.
    """
    data = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            data = json.load(f)
    if "train_frames_per_sec" in data:  # legacy flat format
        data = {"smmnist-dcgan": data}
    changed = False
    for name in CONFIGS:
        if name in data:
            continue
        fps, info = bench_reference(name)
        if fps is None:
            continue
        data[name] = {"train_frames_per_sec": fps, **info}
        changed = True
    if changed:
        with open(BASELINE_CACHE, "w") as f:
            json.dump(data, f, indent=2)
    return data or None


def bench_rollout():
    """Generation throughput: prior rollout + decode, the test.py hot path
    (folded 100-sample x 16-video batch, 25-frame horizon)."""
    import jax
    import jax.numpy as jnp
    from srvp_tpu.models import srvp
    from srvp_tpu.models.srvp import SRVPConfig

    cfg = SRVPConfig(**CONFIGS["smmnist-dcgan"]["kwargs"])
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    on_tpu = jax.default_backend() == "tpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    bsz, nt = 1600, 21  # 100 samples x 16 videos, 20 generated frames

    @jax.jit
    def rollout_decode(y0, w, rng):
        if on_tpu:
            gen = srvp.generate_prior_fused(cfg, params, y0, nt, rng=rng)
        else:
            gen = srvp.generate(cfg, params, y0, None, nt, rng=rng, train=False)
        x, _ = srvp.decode(cfg, params, state, w.astype(dt),
                           gen.y[1:].astype(dt), None, train=False)
        return x

    y0 = jnp.zeros((bsz, cfg.ny))
    w = jnp.zeros((bsz, cfg.nh_inf))
    rng = jax.random.PRNGKey(0)
    x = rollout_decode(y0, w, rng)
    _ = float(x.sum())
    n = 10
    t0 = time.perf_counter()
    for i in range(n):
        x = rollout_decode(y0, w, jax.random.fold_in(rng, i))
    _ = float(x.sum())
    dtm = time.perf_counter() - t0
    return (nt - 1) * bsz * n / dtm


def preflight_device(retries=3, probe_timeout=90, wait=60):
    """Fail fast (with a diagnostic JSON line) if the device backend is
    unresponsive, instead of hanging forever inside jax.devices().

    The tunneled axon TPU service occasionally wedges for tens of minutes
    (observed after Mosaic crashes and transient outages); an in-process
    jax.devices() then blocks with no timeout. Probe from a killable
    subprocess, retrying over a few minutes to ride out short wedges."""
    import subprocess
    last = ""
    for i in range(retries):
        try:
            proc = subprocess.run(
                [sys.executable, "-c",
                 f"import sys; sys.path.insert(0, {REPO!r})\n"
                 "from srvp_tpu.utils.runtime import honor_jax_platforms_env\n"
                 "honor_jax_platforms_env()\n"  # an explicit JAX_PLATFORMS=cpu must win over the axon plugin
                 "import jax; print(jax.devices()[0].device_kind)"],
                capture_output=True, text=True, timeout=probe_timeout)
            if proc.returncode == 0:
                return True
            last = (proc.stderr or "").strip()[-500:]
        except subprocess.TimeoutExpired:
            last = f"device probe hung >{probe_timeout}s (service wedged?)"
        if i + 1 < retries:
            print(f"device preflight failed ({last}); retrying in {wait}s",
                  file=sys.stderr, flush=True)
            time.sleep(wait)
    print(json.dumps({"metric": "train_frames_per_sec_per_chip",
                      "value": None, "error": f"device unavailable: {last}"}))
    return False


def main():
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    if not preflight_device():
        sys.exit(3)
    baseline = get_baseline()
    per_config = {}
    for name in CONFIGS:
        fps, info = bench_ours(name)
        per_config[name] = {"train_frames_per_sec_per_chip": round(fps, 1),
                            **info}
        ref = (baseline or {}).get(name)
        if ref:
            per_config[name]["vs_baseline"] = round(
                fps / ref["train_frames_per_sec"], 2)
        # Progress snapshot after each config: on slow-compile days (remote
        # compiles have run 3x the usual ~5 min) an outer timeout killing
        # the remaining configs still leaves the partial numbers on disk
        # and stderr, without adding lines to the one-JSON-line stdout
        # contract.
        snap = {"metric": "train_frames_per_sec_per_chip", "partial": True,
                "configs": dict(per_config)}
        with open(os.path.join(REPO, "bench_partial.json"), "w") as f:
            json.dump(snap, f)
        print(json.dumps(snap), file=sys.stderr, flush=True)
    ours_fps = per_config["smmnist-dcgan"]["train_frames_per_sec_per_chip"]

    # LIVE end-to-end loop rate (real train_main: loader + H2D + dispatch +
    # step), vs the jit-chained compute ceiling above. Short legs to bound
    # bench wall time; scripts/bench_live.py measures the full version.
    live = {}
    for name, n_iter in (("smmnist-dcgan", 800), ("kth-vgg", 96)):
        try:
            from scripts.bench_live import run_live
            fps, _ = run_live(name, k=1, data_root="/tmp/srvp_live_bench",
                              n_iter=n_iter)
            live[name] = round(fps, 1)
        except Exception as e:  # live leg must never sink the bench line
            live[name] = None
            print(f"live leg {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    rollout_fps = bench_rollout()
    ref0 = (baseline or {}).get("smmnist-dcgan")
    vs = ours_fps / ref0["train_frames_per_sec"] if ref0 else float("nan")
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": ours_fps,
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2) if ref0 else None,
        "vs_baseline_note": "reference torch step measured on CPU by this "
                            "harness (no CUDA device here; reference "
                            "publishes no throughput numbers)",
        "configs": per_config,
        "live_frames_per_sec_per_chip": live,
        "rollout_frames_per_sec_per_chip": round(rollout_fps, 1),
        "baseline": baseline,
        "config": {"dataset": "smmnist-synth", "archi": "dcgan",
                   "seq_len": CONFIGS["smmnist-dcgan"]["seq_len"],
                   "batch": CONFIGS["smmnist-dcgan"]["batch"]},
    }))


if __name__ == "__main__":
    main()
