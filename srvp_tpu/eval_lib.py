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

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from srvp_tpu.metrics.pixel import frame_mse
from srvp_tpu.metrics.ssim import video_ssim
from srvp_tpu.models import srvp
from srvp_tpu.utils.runtime import compiler_options_from_env

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

        # ---- fold the sample axis into the batch, VIDEO-MAJOR ----
        # Folded row b*S+s keeps all S samples of one video contiguous, so a
        # GSPMD mesh that shards the video axis shards the folded axis too
        # (same batch-major treatment as training, models/srvp.py) and the
        # per-video best/worst reduction stays device-local.
        hx32_f = jnp.repeat(hx32, n_samples, axis=1)
        hx_z_f = jnp.repeat(hx_z, n_samples, axis=1)
        w_f = jnp.repeat(w, n_samples, axis=0)
        skips_f = None
        if skips is not None:
            skips_f = [jnp.repeat(s, n_samples, axis=0) for s in skips]

        k_y, k_inf, k_gen = jax.random.split(keys[0], 3)
        y_0, _ = srvp.infer_y(cfg, params, hx32_f[: cfg.nt_inf], k_y)
        # inference rollout over conditioning frames (training dt)
        gen_inf = srvp.generate(cfg, params, y_0, None, nt_cond,
                                oversampling=o_inf, rng=k_inf, train=False,
                                hx_z=hx_z_f)
        # conditioning reconstruction: only sample 0 is kept (test.py:241-242)
        # — rows b*S+0 of the video-major fold, i.e. stride-S over the batch.
        x_rec, _ = srvp.decode(cfg, params, bn_state, w.astype(compute_dtype),
                               gen_inf.y[:, ::n_samples].astype(compute_dtype),
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
        x_target_f = jnp.repeat(x_target, n_samples, axis=1)
        mse = frame_mse(x_pred, x_target_f)                       # (T, B*S, C)
        psnr = (10 * jnp.log10(1.0 / mse)).mean(2).mean(0)        # (B*S,)
        ssim_v = video_ssim(x_pred, x_target_f).mean(2).mean(0)   # (B*S,)
        metrics = {"psnr": psnr.reshape(bsz, n_samples).T,
                   "ssim": ssim_v.reshape(bsz, n_samples).T}
        if lpips_fn is not None:
            metrics["lpips"] = lpips_fn(x_pred, x_target_f).mean(0) \
                .reshape(bsz, n_samples).T

        x_pred_u8 = jnp.transpose(
            (x_pred * 255.0).astype(jnp.uint8)
            .reshape((t_pred, bsz, n_samples) + x_pred.shape[2:]),
            (2, 1, 0, 3, 4, 5))
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
                                  compute_dtype, lpips_fn, use_fused_rollout),
                   compiler_options=compiler_options_from_env())


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

    @partial(jax.jit, compiler_options=compiler_options_from_env())
    def select_chunk(carry, params, bn_state, x_cond, x_target, keys,
                     chunk_start):
        x_pred_u8, x_rec_u8, metrics = compute(params, bn_state, x_cond,
                                               x_target, keys)
        chunk = keys.shape[0]
        carry = dict(carry)
        carry["rec"] = jnp.where(chunk_start == 0, x_rec_u8, carry["rec"])
        n_rand = carry["random"].shape[0]

        # lax.fori_loop over the chunk's samples: compile size is constant in
        # (chunk, metrics) instead of the fully-unrolled update chain
        # (round-2 version scaled compile time with chunk x metrics).
        def body(s, c):
            gid = chunk_start + s
            frm = jax.lax.dynamic_index_in_dim(x_pred_u8, s, 0, keepdims=False)
            slot = (jnp.arange(n_rand) == gid).reshape(
                (n_rand,) + (1,) * frm.ndim)
            c["random"] = jnp.where(slot, frm[None], c["random"])
            for name in metric_names:
                v = jax.lax.dynamic_index_in_dim(metrics[name], s, 0,
                                                 keepdims=False)
                better = v < c[f"{name}_best_val"] if LOWER_BETTER[name] \
                    else v > c[f"{name}_best_val"]
                worse = v > c[f"{name}_worst_val"] if LOWER_BETTER[name] \
                    else v < c[f"{name}_worst_val"]
                bshape = better.reshape((-1,) + (1,) * (frm.ndim - 1))
                wshape = worse.reshape((-1,) + (1,) * (frm.ndim - 1))
                c[f"{name}_best_val"] = jnp.where(
                    better, v, c[f"{name}_best_val"])
                c[f"{name}_best_frm"] = jnp.where(
                    bshape, frm, c[f"{name}_best_frm"])
                c[f"{name}_worst_val"] = jnp.where(
                    worse, v, c[f"{name}_worst_val"])
                c[f"{name}_worst_frm"] = jnp.where(
                    wshape, frm, c[f"{name}_worst_frm"])
            return c

        return jax.lax.fori_loop(0, chunk, body, carry)

    return select_chunk


def _carry_shardings(mesh, carry):
    """Per-leaf NamedShardings for the selection carry: every leaf is
    per-video, with the video axis at 1 for `random` and 0 elsewhere."""
    from srvp_tpu.parallel.mesh import batch_sharding
    return {k: batch_sharding(mesh, 1 if k == "random" else 0, v.ndim)
            for k, v in carry.items()}


def run_test_device(select_fn, params, bn_state, loader, nt_cond, nt_test,
                    n_samples, chunk, base_key, metric_names, hw_c,
                    progress=True, mesh=None, pad_to=None):
    """Evaluation loop with device-side selection: per batch, only the
    selected artifacts are transferred (vs all n_samples in run_test).

    `mesh`: optional jax.sharding.Mesh — the batch's VIDEO axis is sharded
    over it (conditioning encode, all S rollouts and the per-video selection
    partition cleanly because the sample fold is video-major, see
    _build_compute). Multi-device eval is the TPU answer to the reference's
    single-GPU test.py loop (/root/reference/test.py:219-277).

    `pad_to`: optional fixed video-batch size — ragged batches (the final
    remainder of a 5000-video protocol) are edge-padded to this size so
    exactly ONE program is compiled per (shape, mode), and so the batch
    always divides the mesh. Padded videos are dropped on the host; metrics
    and artifacts are unaffected (selection is strictly per-video)."""
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
    if mesh is not None:
        from srvp_tpu.parallel.mesh import batch_sharding, replicated
        params = jax.device_put(params, replicated(mesh))
        bn_state = jax.device_put(bn_state, replicated(mesh))
        if pad_to is not None:
            assert pad_to % mesh.devices.size == 0, (
                f"pad_to={pad_to} must be a multiple of the "
                f"{mesh.devices.size}-device mesh size")

    for b_idx, batch in enumerate(loader):
        x = np.asarray(batch)[:nt_test]
        real_bsz = x.shape[1]
        bsz = real_bsz
        if pad_to is not None:
            assert real_bsz <= pad_to, (real_bsz, pad_to)
            bsz = pad_to
        elif mesh is not None:
            n_dev = mesh.devices.size
            bsz = -(-real_bsz // n_dev) * n_dev
        if bsz != real_bsz:
            x = np.pad(x, ((0, 0), (0, bsz - real_bsz))
                       + ((0, 0),) * (x.ndim - 2), mode="edge")
        x_cond = jnp.asarray(x[:nt_cond])
        x_target = jnp.asarray(x[nt_cond:])
        cond.append(_host_u8(x[:nt_cond, :real_bsz]))
        gt.append(_host_u8(x[nt_cond:, :real_bsz]))

        carry = init_select_carry(metric_names, bsz, t_pred, nt_cond, hw_c,
                                  n_random)
        if mesh is not None:
            shardings = _carry_shardings(mesh, carry)
            carry = {k: jax.device_put(v, shardings[k])
                     for k, v in carry.items()}
            x_cond = jax.device_put(x_cond,
                                    batch_sharding(mesh, 1, x_cond.ndim))
            x_target = jax.device_put(x_target,
                                      batch_sharding(mesh, 1, x_target.ndim))
        for c in range(n_chunks):
            keys = jax.random.split(
                jax.random.fold_in(jax.random.fold_in(base_key, b_idx), c), chunk)
            carry = select_fn(carry, params, bn_state, x_cond, x_target, keys,
                              jnp.int32(c * chunk))
        carry = jax.device_get(carry)
        cond_rec.append(carry["rec"][:real_bsz])
        for r in range(n_random):
            random_samples[r].append(carry["random"][r][:real_bsz])
        for name in metric_names:
            results[name].append(carry[f"{name}_best_val"][:real_bsz])
            best_samples[name].append(carry[f"{name}_best_frm"][:real_bsz])
            worst_samples[name].append(carry[f"{name}_worst_frm"][:real_bsz])
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
