"""Evaluation machinery for test.py: best/worst-of-N sampling with metrics.

Protocol parity with /root/reference/test.py:219-319:
  * per batch: encode conditioning frames once (skips from the last frame),
    then N stochastic rollouts; per sample compute PSNR / SSIM (/ LPIPS)
    per video; keep the best and worst sample per metric per video, the
    first five samples, and the first sample's conditioning reconstruction
  * inference over conditioning frames uses the TRAINING Euler step count,
    generation uses the eval-time one (test.py:239,244)

TPU re-design:
  * the deterministic conditioning work (encoder, content w, z-LSTM) is
    hoisted OUT of the sample loop (the reference recomputes it for each of
    the 100 samples)
  * the S-sample axis is FOLDED into the batch so every conv/matmul sees an
    (S*B)-row batch — full MXU tiles; the prior rollout can use the
    weights-stationary Pallas kernel
  * best/worst/random selection runs ON DEVICE with a carried state, so only
    the selected artifacts (≈11 videos/batch instead of all N samples) are
    ever transferred to the host
"""

import numpy as np

import jax
import jax.numpy as jnp

from srvp_tpu.metrics.pixel import frame_mse
from srvp_tpu.metrics.ssim import video_ssim
from srvp_tpu.models import srvp

LOWER_BETTER = {"mse": True, "fvd": True, "lpips": True, "psnr": False, "ssim": False}


def _build_compute(cfg, nt_cond, nt_test, o_inf, o_gen, compute_dtype,
                   lpips_fn, use_fused_rollout):
    """Returns the pure per-chunk sampler (unjitted)."""
    from srvp_tpu.models.lstm import lstm_apply

    def compute(params, bn_state, x_cond, x_target, keys):
        n_samples = keys.shape[0]
        bsz = x_cond.shape[1]
        x_cond_c = x_cond.astype(compute_dtype)
        # ---- deterministic conditioning work, computed ONCE ----
        hx, skips, _ = srvp.encode(cfg, params, bn_state, x_cond_c, train=False)
        hx32 = hx.astype(jnp.float32)
        w = srvp.infer_w(cfg, params, hx32, train=False)
        hx_z = lstm_apply(params["inf_z"], hx32)

        # ---- fold the sample axis into the batch ----
        hx32_f = jnp.tile(hx32, (1, n_samples, 1))
        hx_z_f = jnp.tile(hx_z, (1, n_samples, 1))
        w_f = jnp.tile(w, (n_samples, 1))
        skips_f = None
        if skips is not None:
            skips_f = [jnp.tile(s, (n_samples,) + (1,) * (s.ndim - 1))
                       for s in skips]

        k_y, k_inf, k_gen = jax.random.split(keys[0], 3)
        y_0, _ = srvp.infer_y(cfg, params, hx32_f[: cfg.nt_inf], k_y)
        # inference rollout over conditioning frames (training dt)
        gen_inf = srvp.generate(cfg, params, y_0, None, nt_cond,
                                oversampling=o_inf, rng=k_inf, train=False,
                                hx_z=hx_z_f)
        # conditioning reconstruction: only sample 0 is kept (test.py:241-242)
        x_rec, _ = srvp.decode(cfg, params, bn_state, w.astype(compute_dtype),
                               gen_inf.y[:, :bsz].astype(compute_dtype),
                               skips, train=False)
        # pure prior rollout from the last inferred state (eval dt)
        if use_fused_rollout:
            gen = srvp.generate_prior_fused(cfg, params, gen_inf.y[-1],
                                            nt_test - nt_cond + 1,
                                            oversampling=o_gen, rng=k_gen)
        else:
            gen = srvp.generate(cfg, params, gen_inf.y[-1], None,
                                nt_test - nt_cond + 1, oversampling=o_gen,
                                rng=k_gen, train=False)
        x_pred, _ = srvp.decode(cfg, params, bn_state, w_f.astype(compute_dtype),
                                gen.y[1:].astype(compute_dtype),
                                skips_f, train=False)
        x_pred = jnp.clip(x_pred.astype(jnp.float32), 0.0, 1.0)  # (T, S*B, ...)

        t_pred = x_pred.shape[0]
        x_target_f = jnp.tile(x_target, (1, n_samples) + (1,) * (x_target.ndim - 2))
        mse = frame_mse(x_pred, x_target_f)                       # (T, S*B, C)
        psnr = (10 * jnp.log10(1.0 / mse)).mean(2).mean(0)        # (S*B,)
        ssim_v = video_ssim(x_pred, x_target_f).mean(2).mean(0)   # (S*B,)
        metrics = {"psnr": psnr.reshape(n_samples, bsz),
                   "ssim": ssim_v.reshape(n_samples, bsz)}
        if lpips_fn is not None:
            metrics["lpips"] = lpips_fn(x_pred, x_target_f).mean(0) \
                .reshape(n_samples, bsz)

        x_pred_u8 = jnp.transpose(x_pred * 255.0, (1, 0, 2, 3, 4)) \
            .astype(jnp.uint8).reshape((n_samples, bsz, t_pred)
                                       + x_pred.shape[2:])
        return x_pred_u8, _to_u8(x_rec.astype(jnp.float32)), metrics

    return compute


def make_test_chunk(cfg, nt_cond, nt_test, o_inf, o_gen, compute_dtype=jnp.float32,
                    lpips_fn=None, use_fused_rollout=False):
    """Jitted per-chunk sampler returning all frames + metrics.

    fn(params, bn_state, x_cond, x_target, keys) ->
      (x_pred_u8 (S, B, T_pred, H, W, C), x_rec_u8 (B, T_cond, ...),
       metrics {psnr, ssim[, lpips]: (S, B)})
    """
    return jax.jit(_build_compute(cfg, nt_cond, nt_test, o_inf, o_gen,
                                  compute_dtype, lpips_fn, use_fused_rollout))


# ---------------------------------------------------------------------------
# Device-side selection
# ---------------------------------------------------------------------------

def init_select_carry(metric_names, bsz, t_pred, t_cond, hw_c, n_random):
    """Device carry for on-device best/worst tracking."""
    carry = {"random": jnp.zeros((n_random, bsz, t_pred) + hw_c, jnp.uint8),
             "rec": jnp.zeros((bsz, t_cond) + hw_c, jnp.uint8)}
    for name in metric_names:
        sign = 1.0 if LOWER_BETTER[name] else -1.0
        carry[f"{name}_best_val"] = jnp.full((bsz,), sign * jnp.inf)
        carry[f"{name}_worst_val"] = jnp.full((bsz,), -sign * jnp.inf)
        carry[f"{name}_best_frm"] = jnp.zeros((bsz, t_pred) + hw_c, jnp.uint8)
        carry[f"{name}_worst_frm"] = jnp.zeros((bsz, t_pred) + hw_c, jnp.uint8)
    return carry


def make_select_chunk(cfg, nt_cond, nt_test, o_inf, o_gen, metric_names,
                      compute_dtype=jnp.float32, lpips_fn=None,
                      use_fused_rollout=False, n_random=5):
    """Jitted chunk step with on-device best/worst/random selection.

    fn(carry, params, bn_state, x_cond, x_target, keys, chunk_start) -> carry.
    Strictly-better replacement keeps the FIRST sample on ties, matching the
    reference's iterative update (test.py:260-277).
    """
    compute = _build_compute(cfg, nt_cond, nt_test, o_inf, o_gen,
                             compute_dtype, lpips_fn, use_fused_rollout)

    @jax.jit
    def select_chunk(carry, params, bn_state, x_cond, x_target, keys,
                     chunk_start):
        x_pred_u8, x_rec_u8, metrics = compute(params, bn_state, x_cond,
                                               x_target, keys)
        chunk = keys.shape[0]
        carry = dict(carry)
        carry["rec"] = jnp.where(chunk_start == 0, x_rec_u8, carry["rec"])
        for s in range(chunk):
            gid = chunk_start + s
            frm = x_pred_u8[s]
            for r in range(carry["random"].shape[0]):
                carry["random"] = carry["random"].at[r].set(
                    jnp.where(gid == r, frm, carry["random"][r]))
            for name in metric_names:
                v = metrics[name][s]
                better = v < carry[f"{name}_best_val"] if LOWER_BETTER[name] \
                    else v > carry[f"{name}_best_val"]
                worse = v > carry[f"{name}_worst_val"] if LOWER_BETTER[name] \
                    else v < carry[f"{name}_worst_val"]
                bshape = better.reshape((-1,) + (1,) * (frm.ndim - 1))
                wshape = worse.reshape((-1,) + (1,) * (frm.ndim - 1))
                carry[f"{name}_best_val"] = jnp.where(
                    better, v, carry[f"{name}_best_val"])
                carry[f"{name}_best_frm"] = jnp.where(
                    bshape, frm, carry[f"{name}_best_frm"])
                carry[f"{name}_worst_val"] = jnp.where(
                    worse, v, carry[f"{name}_worst_val"])
                carry[f"{name}_worst_frm"] = jnp.where(
                    wshape, frm, carry[f"{name}_worst_frm"])
        return carry

    return select_chunk


def run_test_device(select_fn, params, bn_state, loader, nt_cond, nt_test,
                    n_samples, chunk, base_key, metric_names, hw_c,
                    progress=True):
    """Evaluation loop with device-side selection: per batch, only the
    selected artifacts are transferred (vs all n_samples in run_test)."""
    chunk = min(chunk, n_samples)
    assert n_samples % chunk == 0
    n_chunks = n_samples // chunk
    n_random = min(5, n_samples)
    t_pred = nt_test - nt_cond
    random_samples = [[] for _ in range(n_random)]
    cond, cond_rec, gt = [], [], []
    results = {name: [] for name in metric_names}
    best_samples = {name: [] for name in metric_names}
    worst_samples = {name: [] for name in metric_names}

    for b_idx, batch in enumerate(loader):
        x = np.asarray(batch)[:nt_test]
        bsz = x.shape[1]
        x_cond = jnp.asarray(x[:nt_cond])
        x_target = jnp.asarray(x[nt_cond:])
        cond.append(_host_u8(x[:nt_cond]))
        gt.append(_host_u8(x[nt_cond:]))

        carry = init_select_carry(metric_names, bsz, t_pred, nt_cond, hw_c,
                                  n_random)
        for c in range(n_chunks):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(base_key, b_idx), c), chunk)
            carry = select_fn(carry, params, bn_state, x_cond, x_target, keys,
                              jnp.int32(c * chunk))
        carry = jax.device_get(carry)
        cond_rec.append(carry["rec"])
        for r in range(n_random):
            random_samples[r].append(carry["random"][r])
        for name in metric_names:
            results[name].append(carry[f"{name}_best_val"])
            best_samples[name].append(carry[f"{name}_best_frm"])
            worst_samples[name].append(carry[f"{name}_worst_frm"])
        if progress:
            print(f"  batch {b_idx + 1} done", flush=True)

    samples = {f"random_{i + 1}": np.concatenate(random_samples[i])
               for i in range(n_random)}
    samples["cond_rec"] = np.concatenate(cond_rec)
    for name in metric_names:
        samples[f"{name}_best"] = np.concatenate(best_samples[name])
        samples[f"{name}_worst"] = np.concatenate(worst_samples[name])
        results[name] = np.concatenate(results[name]).astype(np.float32)
    return results, samples, np.concatenate(cond), np.concatenate(gt)


# ---------------------------------------------------------------------------
# Host-side selection (kept as the portable fallback / oracle for tests)
# ---------------------------------------------------------------------------

def _to_u8(x):
    """float [0,1] (T,B,H,W,C) -> uint8 (B,T,H,W,C), torch .mul(255).byte()
    truncation semantics (test.py:226,255)."""
    return jnp.transpose(x * 255.0, (1, 0, 2, 3, 4)).astype(jnp.uint8)


def _better(name, ref, hyp):
    return hyp < ref if LOWER_BETTER[name] else hyp > ref


class BestWorstTracker:
    """Host-side per-video best/worst sample bookkeeping (test.py:260-277)."""

    def __init__(self, metric_names):
        self.names = list(metric_names)
        self.metric_best = {}
        self.sample_best = {}
        self.metric_worst = {}
        self.sample_worst = {}

    def update(self, metrics, samples):
        """metrics: {name: (S, B)}; samples: (S, B, T, H, W, C) uint8."""
        for name in self.names:
            vals = np.asarray(metrics[name])
            for s in range(vals.shape[0]):
                v, x = vals[s], np.asarray(samples[s])
                if name not in self.metric_best:
                    self.metric_best[name] = v.copy()
                    self.sample_best[name] = x.copy()
                    self.metric_worst[name] = v.copy()
                    self.sample_worst[name] = x.copy()
                    continue
                ib = _better(name, self.metric_best[name], v)
                self.metric_best[name][ib] = v[ib]
                self.sample_best[name][ib] = x[ib]
                iw = _better(name, v, self.metric_worst[name])
                self.metric_worst[name][iw] = v[iw]
                self.sample_worst[name][iw] = x[iw]


def run_test(test_chunk_fn, params, bn_state, loader, nt_cond, nt_test,
             n_samples, chunk, base_key, metric_names, device_put=None,
             progress=True):
    """Host-selection evaluation loop. Returns (results, samples_dict, cond,
    gt): results {name: (N,) best-per-video}, samples_dict holds artifact
    arrays keyed like the reference npz outputs."""
    chunk = min(chunk, n_samples)
    assert n_samples % chunk == 0
    n_chunks = n_samples // chunk
    n_random = min(5, n_samples)
    random_samples = [[] for _ in range(n_random)]
    cond, cond_rec, gt = [], [], []
    results = {name: [] for name in metric_names}
    best_samples = {name: [] for name in metric_names}
    worst_samples = {name: [] for name in metric_names}

    for b_idx, batch in enumerate(loader):
        x = np.asarray(batch)[:nt_test]
        x_cond = jnp.asarray(x[:nt_cond])
        x_target = jnp.asarray(x[nt_cond:])
        if device_put is not None:
            x_cond, x_target = device_put(x_cond), device_put(x_target)
        cond.append(_host_u8(x[:nt_cond]))
        gt.append(_host_u8(x[nt_cond:]))

        tracker = BestWorstTracker(metric_names)
        for c in range(n_chunks):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(base_key, b_idx), c), chunk)
            x_pred_u8, x_rec_u8, metrics = test_chunk_fn(
                params, bn_state, x_cond, x_target, keys)
            x_pred_u8 = np.asarray(x_pred_u8)
            if c == 0:
                cond_rec.append(np.asarray(x_rec_u8))
            for s_local in range(chunk):
                s_global = c * chunk + s_local
                if s_global < n_random:
                    random_samples[s_global].append(x_pred_u8[s_local])
            tracker.update(metrics, x_pred_u8)
        for name in metric_names:
            results[name].append(tracker.metric_best[name])
            best_samples[name].append(tracker.sample_best[name])
            worst_samples[name].append(tracker.sample_worst[name])
        if progress:
            print(f"  batch {b_idx + 1} done", flush=True)

    samples = {f"random_{i + 1}": np.concatenate(random_samples[i])
               for i in range(n_random)}
    samples["cond_rec"] = np.concatenate(cond_rec)
    for name in metric_names:
        samples[f"{name}_best"] = np.concatenate(best_samples[name])
        samples[f"{name}_worst"] = np.concatenate(worst_samples[name])
        results[name] = np.concatenate(results[name])
    cond = np.concatenate(cond)
    gt = np.concatenate(gt)
    return results, samples, cond, gt


def _host_u8(x):
    """float (T,B,H,W,C) -> uint8 (B,T,H,W,C)."""
    return np.transpose((np.asarray(x) * 255.0).astype(np.uint8), (1, 0, 2, 3, 4))
