#!/usr/bin/env python
"""Benchmark: SRVP training throughput (frames/sec/chip), ours vs reference.

Prints ONE JSON line:
    {"metric": "train_frames_per_sec_per_chip", "value": N, "unit":
     "frames/s/chip", "vs_baseline": N, ...extra context keys}

Baseline: the reference PyTorch train step (/root/reference/train.py:49-129)
measured by this harness on the best torch backend available on this machine
(CPU in this environment — the reference publishes no throughput numbers and
no CUDA device exists here; see BASELINE.md). The measured baseline is cached
in bench_baseline.json so later rounds compare against the same number.

Config: flagship Stochastic Moving MNIST (dcgan, ny=nz=20, seq_len 15,
batch 128 — reference README.md:108-118 defaults), synthetic digit data.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "bench_baseline.json")

SEQ_LEN = 15
BATCH = 128
STEPS = 50
WARMUP = 5


def make_batch(seed=0):
    return np.random.RandomState(seed).rand(
        SEQ_LEN, BATCH, 64, 64, 1).astype(np.float32)


def bench_ours():
    import jax
    import jax.numpy as jnp
    from srvp_tpu.utils.runtime import setup_compilation_cache
    setup_compilation_cache()
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig
    from srvp_tpu.parallel import make_mesh, replicated, shard_batch

    cfg = SRVPConfig(nx=64, nc=1, nf=64, nhx=128, ny=20, nz=20, skipco=False,
                     nt_inf=5, nh_inf=256, nlayers_inf=3, nh_res=512,
                     nlayers_res=4, archi="dcgan")
    hp = train_lib.TrainHParams(
        nt_cond=5,
        compute_dtype=jnp.bfloat16 if jax.default_backend() == "tpu"
        else jnp.float32)
    mesh = make_mesh()
    n_chips = mesh.devices.size
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    ts = jax.device_put(ts, replicated(mesh))
    step = train_lib.make_train_step(cfg, hp)
    x = shard_batch(mesh, jnp.asarray(make_batch()))

    for _ in range(WARMUP):
        ts, metrics = step(ts, x)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(STEPS):
        ts, metrics = step(ts, x)
    # Fetch the final VALUE: step N's loss depends on step N-1's params, so
    # this forces the whole chain. (block_until_ready alone is not reliable
    # on the tunneled axon platform.)
    float(metrics["loss"])
    dt = time.perf_counter() - t0
    fps = SEQ_LEN * BATCH * STEPS / dt
    return fps / n_chips, {"backend": jax.default_backend(), "chips": n_chips,
                           "steps": STEPS, "sec_per_step": dt / STEPS,
                           "loss": float(metrics["loss"])}


def bench_reference():
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

        torch.manual_seed(0)
        model = ref_srvp.StochasticLatentResidualVideoPredictor(
            64, 1, 64, 128, 20, 20, False, 5, 256, 3, 512, 4, "dcgan")
        model.init(res_gain=1.41)
        model.train()
        optimizer = torch.optim.Adam(model.parameters(), lr=3e-4)
        x = torch.from_numpy(
            np.transpose(make_batch(), (0, 1, 4, 2, 3))).contiguous()

        def one_step():
            optimizer.zero_grad()
            x_, y, z, _, q_y_0_params, q_z_params, p_z_params, res = model(
                x, SEQ_LEN, dt=1.0)
            nll = ref_utils.neg_logprob(x_, x, scale=1.0).sum()
            q_y_0 = ref_utils.make_normal_from_raw_params(q_y_0_params)
            kl_y_0 = distrib.kl_divergence(q_y_0, distrib.Normal(0, 1)).sum()
            q_z = ref_utils.make_normal_from_raw_params(q_z_params)
            p_z = ref_utils.make_normal_from_raw_params(p_z_params)
            kl_z = distrib.kl_divergence(q_z, p_z).sum()
            loss = (nll + kl_y_0 + kl_z
                    + torch.norm(res, p=2, dim=2).sum()) / BATCH
            loss.backward()
            optimizer.step()
            return float(loss)

        n_steps = 3
        one_step()  # warmup
        t0 = time.perf_counter()
        for _ in range(n_steps):
            loss = one_step()
        dt = time.perf_counter() - t0
        fps = SEQ_LEN * BATCH * n_steps / dt
        dev = "cuda" if torch.cuda.is_available() else "cpu"
        return fps, {"backend": f"torch-{dev}", "sec_per_step": dt / n_steps,
                     "loss": loss}
    finally:
        sys.path.remove("/root/reference")


def get_baseline():
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    fps, info = bench_reference()
    if fps is None:
        return None
    data = {"train_frames_per_sec": fps, **info}
    with open(BASELINE_CACHE, "w") as f:
        json.dump(data, f, indent=2)
    return data


def bench_rollout():
    """Generation throughput: prior rollout + decode, the test.py hot path
    (folded 100-sample x 16-video batch, 25-frame horizon)."""
    import jax
    import jax.numpy as jnp
    from srvp_tpu.models import srvp
    from srvp_tpu.models.srvp import SRVPConfig

    cfg = SRVPConfig(nx=64, nc=1, nf=64, nhx=128, ny=20, nz=20, skipco=False,
                     nt_inf=5, nh_inf=256, nlayers_inf=3, nh_res=512,
                     nlayers_res=4, archi="dcgan")
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
    import time as _t
    n = 10
    t0 = _t.perf_counter()
    for i in range(n):
        x = rollout_decode(y0, w, jax.random.fold_in(rng, i))
    _ = float(x.sum())
    dtm = _t.perf_counter() - t0
    return (nt - 1) * bsz * n / dtm


def main():
    baseline = get_baseline()
    ours_fps, info = bench_ours()
    rollout_fps = bench_rollout()
    vs = ours_fps / baseline["train_frames_per_sec"] if baseline else float("nan")
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "value": round(ours_fps, 1),
        "unit": "frames/s/chip",
        "vs_baseline": round(vs, 2) if baseline else None,
        "ours": info,
        "rollout_frames_per_sec_per_chip": round(rollout_fps, 1),
        "baseline": baseline,
        "config": {"dataset": "smmnist-synth", "archi": "dcgan",
                   "seq_len": SEQ_LEN, "batch": BATCH},
    }))


if __name__ == "__main__":
    main()
