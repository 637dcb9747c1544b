#!/usr/bin/env python
"""Training-dynamics oracle: reference torch SRVP vs srvp-tpu on IDENTICAL
synthetic-glyph data, matched hyperparameters, loss-component trajectories.

Round-1 finding: the 418k-step JAX run collapses kl_z to ~1e-8 by step 200k
(xp/smmnist_v2/metrics.jsonl) and nll stays flat. The question this script
answers: does the REFERENCE implementation (run as a measurement oracle from
/root/reference, the same way bench.py does) hold kl_z > 0 on the same data
where the JAX build collapses? If both collapse the plateau is data-induced;
if torch holds, the JAX build has a dynamics bug.

Usage:
    python scripts/dynamics_oracle.py torch --steps 15000 --out torch.jsonl
    python scripts/dynamics_oracle.py jax   --steps 15000 --out jax.jsonl

Both sides consume the exact same numpy batch stream (seeded synthetic
glyphs through srvp_tpu's MovingMNIST physics) and log
{step, loss, nll, kl_y_0, kl_z, l2_res} means every --log-every steps plus
best-of-N validation pred-PSNR every --val-every steps.

Loss semantics on the torch side mirror /root/reference/train.py:91-106;
validation mirrors /root/reference/train.py:165-186 (best sample by
all-frame PSNR, report prediction-frame PSNR).

Two matched recipes are available via --recipe: the flagship SMMNIST
(dcgan, 1 Euler step) and a scaled-down KTH (vgg+skipco, 2 Euler substeps,
obs_scale 0.2) — both reduced (nf 64->16 etc.) so the torch side is
feasible on this machine's single CPU core.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# ----- matched configs (reduced recipes; nf 64->16 etc. so the torch side
# is feasible on this machine's single CPU core) ----------------------------
RECIPES = {
    # flagship SMMNIST (dcgan) — the original oracle config
    "smmnist": dict(
        cfg=dict(nx=64, nc=1, nf=16, nhx=64, ny=8, nz=8, skipco=False,
                 nt_inf=3, nh_inf=128, nlayers_inf=2, nh_res=256,
                 nlayers_res=3, archi="dcgan"),
        seq_len=10, nt_cond=4, beta_y=1.0, beta_z=2.0, l2_res=1.0,
        obs_scale=1.0, res_gain=1.41, n_euler_steps=1),
    # KTH recipe scaled down (vgg+skipco, 2 Euler substeps, obs_scale 0.2,
    # res_gain 1.2 — /root/reference/README.md KTH training command)
    "kth": dict(
        cfg=dict(nx=64, nc=1, nf=16, nhx=64, ny=12, nz=12, skipco=True,
                 nt_inf=3, nh_inf=128, nlayers_inf=2, nh_res=256,
                 nlayers_res=3, archi="vgg"),
        seq_len=12, nt_cond=6, beta_y=1.0, beta_z=1.0, l2_res=1.0,
        obs_scale=0.2, res_gain=1.2, n_euler_steps=2),
}

CFG = None
SEQ_LEN = NT_COND = None
BATCH = 16
LR = 3e-4
BETA_Y = BETA_Z = L2_RES = OBS_SCALE = RES_GAIN = N_EULER = None
N_VAL_VIDEOS = 32
N_VAL_SAMPLES = 5


def apply_recipe(name):
    global CFG, SEQ_LEN, NT_COND, BETA_Y, BETA_Z, L2_RES, OBS_SCALE, \
        RES_GAIN, N_EULER
    r = RECIPES[name]
    CFG = r["cfg"]
    SEQ_LEN, NT_COND = r["seq_len"], r["nt_cond"]
    BETA_Y, BETA_Z, L2_RES = r["beta_y"], r["beta_z"], r["l2_res"]
    OBS_SCALE, RES_GAIN, N_EULER = (r["obs_scale"], r["res_gain"],
                                    r["n_euler_steps"])

_TRAIN_SEED0 = 1_000_000
_VAL_SEED0 = 9_000_000


def _dataset():
    from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits
    digits = synthetic_digits(60, np.random.RandomState(7))
    return MovingMNIST(digits, CFG["nx"], SEQ_LEN, 4, False, 2, True)


def make_batch(ds, step):
    """(T, B, H, W) float32 in [0,1]; identical for both sides."""
    vids = np.stack([
        ds.get_item(0, np.random.RandomState(_TRAIN_SEED0 + step * BATCH + i))
        for i in range(BATCH)])                       # (B, T, H, W) uint8
    return np.transpose(vids, (1, 0, 2, 3)).astype(np.float32) / 255.0


def make_val_set(ds):
    vids = np.stack([ds.get_item(0, np.random.RandomState(_VAL_SEED0 + i))
                     for i in range(N_VAL_VIDEOS)])
    return np.transpose(vids, (1, 0, 2, 3)).astype(np.float32) / 255.0


class JsonlLogger:
    def __init__(self, path):
        self.f = open(path, "a", buffering=1)

    def write(self, **kw):
        self.f.write(json.dumps(kw) + "\n")


# ---------------------------------------------------------------------------
# torch side (reference implementation as oracle)
# ---------------------------------------------------------------------------

def run_torch(steps, out, log_every, val_every):
    sys.path.insert(0, "/root/reference")
    import torch
    import torch.distributions as distrib
    torch.set_num_threads(int(os.environ.get("ORACLE_TORCH_THREADS", "1")))
    import module.srvp as ref_srvp
    import module.utils as ref_utils

    torch.manual_seed(42)
    model = ref_srvp.StochasticLatentResidualVideoPredictor(
        CFG["nx"], CFG["nc"], CFG["nf"], CFG["nhx"], CFG["ny"], CFG["nz"],
        CFG["skipco"], CFG["nt_inf"], CFG["nh_inf"], CFG["nlayers_inf"],
        CFG["nh_res"], CFG["nlayers_res"], CFG["archi"])
    model.init(res_gain=RES_GAIN)
    optimizer = torch.optim.Adam(model.parameters(), lr=LR)

    ds = _dataset()
    val = torch.from_numpy(make_val_set(ds)).unsqueeze(2).contiguous()
    log = JsonlLogger(out)
    log.write(side="torch", config=CFG, seq_len=SEQ_LEN, nt_cond=NT_COND,
              n_euler_steps=N_EULER,
              batch=BATCH, lr=LR, beta_y=BETA_Y, beta_z=BETA_Z,
              l2_res=L2_RES, steps=steps)

    def val_psnr():
        model.eval()
        with torch.no_grad():
            x_inf = val[:NT_COND]
            all_p, pred_p = [], []
            for s in range(N_VAL_SAMPLES):
                torch.manual_seed(10_000 + s)
                x_, *_ = model(x_inf, SEQ_LEN, dt=1.0 / N_EULER)
                mse = ((x_ - val) ** 2).mean(dim=(2, 3, 4))     # (T, B)
                psnr = 10 * torch.log10(1.0 / mse)
                all_p.append(psnr.mean(0))                       # (B,)
                pred_p.append(psnr[NT_COND:].mean(0))
            all_p = torch.stack(all_p)                           # (S, B)
            pred_p = torch.stack(pred_p)
            best = all_p.argmax(0)                               # (B,)
            out_p = pred_p.gather(0, best[None])[0]
        model.train()
        return float(out_p.mean())

    model.train()
    window, t0 = [], time.time()
    for step in range(steps):
        x = torch.from_numpy(make_batch(ds, step)).unsqueeze(2).contiguous()
        optimizer.zero_grad()
        x_, y, z, _, q_y0, q_z, p_z, res = model(x, SEQ_LEN,
                                         dt=1.0 / N_EULER)
        nll = ref_utils.neg_logprob(x_, x, scale=OBS_SCALE).sum()
        kl_y = distrib.kl_divergence(
            ref_utils.make_normal_from_raw_params(q_y0),
            distrib.Normal(0, 1)).sum()
        kl_z = distrib.kl_divergence(
            ref_utils.make_normal_from_raw_params(q_z),
            ref_utils.make_normal_from_raw_params(p_z)).sum()
        l2 = torch.norm(res, p=2, dim=2).sum()
        loss = (nll + BETA_Y * kl_y + BETA_Z * kl_z + L2_RES * l2) / BATCH
        loss.backward()
        optimizer.step()
        window.append([float(loss), float(nll) / BATCH, float(kl_y) / BATCH,
                       float(kl_z) / BATCH, float(l2) / BATCH])
        if (step + 1) % log_every == 0:
            m = np.mean(window, axis=0)
            log.write(step=step + 1, loss=m[0], nll=m[1], kl_y_0=m[2],
                      kl_z=m[3], l2_res=m[4],
                      wall_s=round(time.time() - t0, 1))
            window = []
        if (step + 1) % val_every == 0:
            log.write(step=step + 1, val_psnr=val_psnr())


# ---------------------------------------------------------------------------
# jax side (this framework)
# ---------------------------------------------------------------------------

def run_jax(steps, out, log_every, val_every):
    from srvp_tpu.utils.runtime import honor_jax_platforms_env
    honor_jax_platforms_env()   # let JAX_PLATFORMS=cpu win over the axon plugin
    import jax
    import jax.numpy as jnp
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig

    cfg = SRVPConfig(**CFG)
    hp = train_lib.TrainHParams(
        nt_cond=NT_COND, beta_y=BETA_Y, beta_z=BETA_Z, l2_res=L2_RES,
        obs_scale=OBS_SCALE, lr=LR, oversampling=N_EULER,
        n_samples_test=N_VAL_SAMPLES,
        val_samples_chunk=N_VAL_SAMPLES, compute_dtype=jnp.float32)
    ts = train_lib.init_train_state(jax.random.PRNGKey(42), cfg, hp,
                                    res_gain=RES_GAIN)
    step_fn = train_lib.make_train_step(cfg, hp)
    eval_fn = train_lib.make_eval_batch(cfg, hp, SEQ_LEN)

    ds = _dataset()
    val = jnp.asarray(make_val_set(ds)[..., None])     # (T, B, H, W, 1)
    log = JsonlLogger(out)
    log.write(side="jax", config=CFG, seq_len=SEQ_LEN, nt_cond=NT_COND,
              n_euler_steps=N_EULER,
              batch=BATCH, lr=LR, beta_y=BETA_Y, beta_z=BETA_Z,
              l2_res=L2_RES, steps=steps, backend=jax.default_backend())

    window, t0 = [], time.time()
    for step in range(steps):
        x = jnp.asarray(make_batch(ds, step)[..., None])
        ts, metrics = step_fn(ts, x)
        window.append(metrics)
        if (step + 1) % log_every == 0:
            m = {k: float(np.mean([float(w[k]) for w in window]))
                 for k in ("loss", "nll", "kl_y_0", "kl_z", "l2_res")}
            log.write(step=step + 1, **m, wall_s=round(time.time() - t0, 1))
            window = []
        if (step + 1) % val_every == 0:
            pred = eval_fn(ts.params, ts.bn_state, val,
                           jax.random.PRNGKey(10_000))
            log.write(step=step + 1, val_psnr=float(jnp.mean(pred)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("side", choices=["torch", "jax"])
    p.add_argument("--recipe", choices=sorted(RECIPES), default="smmnist")
    p.add_argument("--steps", type=int, default=15000)
    p.add_argument("--out", required=True)
    p.add_argument("--log-every", type=int, default=100)
    p.add_argument("--val-every", type=int, default=1000)
    a = p.parse_args()
    apply_recipe(a.recipe)
    if a.side == "torch":
        run_torch(a.steps, a.out, a.log_every, a.val_every)
    else:
        run_jax(a.steps, a.out, a.log_every, a.val_every)


if __name__ == "__main__":
    main()
