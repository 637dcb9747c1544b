"""Training machinery: train state, jitted train step, jitted validation.

Replaces the reference's torch training internals (/root/reference/train.py):
  * one fused jit program per optimization step (forward + ELBO + backward +
    Adam + lr schedule) with donated train state — no Python in the hot loop
  * linear-decay-after-burn-in lr schedule (train.py:290-293 semantics)
  * best-of-N validation PSNR where the N rollouts are a `vmap`'d sample axis
    evaluated in chunks with `lax.map` (reference loops in Python,
    train.py:172-174); only per-sample PSNRs are carried, never the frames,
    so validation memory is O(batch) instead of O(N * video)
  * full-train-state checkpoints (params, BN stats, optimizer state, step,
    RNG) for resume — a capability upgrade over the reference's
    params-only .pt saves (SURVEY.md §5)
"""

import dataclasses
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from srvp_tpu.metrics.pixel import frame_psnr
from srvp_tpu.models import srvp
from srvp_tpu.objectives import elbo_loss
from srvp_tpu.utils.runtime import compiler_options_from_env


class TrainState(NamedTuple):
    params: Any
    bn_state: Any
    opt_state: Any
    step: jnp.ndarray   # int32 scalar
    rng: jnp.ndarray    # base PRNG key; per-step key = fold_in(rng, step)


@dataclasses.dataclass(frozen=True)
class TrainHParams:
    """Static training hyperparameters (subset of the CLI opt namespace)."""
    oversampling: int = 1
    obs_scale: float = 1.0
    beta_y: float = 1.0
    beta_z: float = 1.0
    l2_res: float = 1.0
    lr: float = 3e-4
    lr_burnin: int = 1000000
    lr_decay_iter: int = 100000
    nt_cond: int = 5
    n_samples_test: int = 100
    val_samples_chunk: int = 25
    compute_dtype: Any = jnp.float32
    fused_rollout: bool = False  # custom-VJP Pallas training rollout


def lr_schedule(hp):
    """Constant until burn-in, then linear decay to 0 over lr_decay_iter steps.

    Matches torch LambdaLR stepped from iteration `burnin` onward
    (reference train.py:290-293,351-352): the k-th post-burn-in step runs at
    lr * (N - k)/N.
    """
    def schedule(count):
        k = jnp.maximum(count - (hp.lr_burnin - 1), 0)
        factor = jnp.clip((hp.lr_decay_iter - k) / hp.lr_decay_iter, 0.0, 1.0)
        return hp.lr * factor
    return schedule


def make_optimizer(hp):
    # torch.optim.Adam defaults (train.py:289): b1=0.9, b2=0.999, eps=1e-8.
    return optax.adam(lr_schedule(hp))


def init_train_state(key, cfg, hp, res_gain=1.41):
    k_init, k_train = jax.random.split(key)
    params, bn_state = srvp.init(k_init, cfg, res_gain=res_gain)
    opt_state = make_optimizer(hp).init(params)
    return TrainState(params, bn_state, opt_state,
                      jnp.zeros((), jnp.int32), k_train)


def make_train_step(cfg, hp, steps_per_call=1):
    """One jitted optimization step — or, with steps_per_call=k > 1, a
    jitted `lax.scan` over k stacked batches (one dispatch + one transfer
    per k steps).

    The scan body IS the single step function — per-step RNG is
    fold_in(rng, step), independent of dispatch grouping — so a k-window
    computes the same update sequence as k single-step calls. Exact floats
    differ at the last-ulp level (~1e-6 relative, tested) because XLA
    fuses the scan body differently than the standalone step; the RNG
    streams, step counters, and schedules are identical. Amortizes
    per-dispatch overhead where it is material (e.g. ~4 ms/call through
    the tunneled axon TPU). The k>1 variant takes batches stacked on a new
    leading axis (see parallel.shard_stacked_batches) and returns the LAST
    step's metrics.
    """
    optimizer = make_optimizer(hp)
    sched = lr_schedule(hp)

    def loss_fn(params, bn_state, x, rng):
        return elbo_loss(cfg, params, bn_state, x, rng,
                         oversampling=hp.oversampling, obs_scale=hp.obs_scale,
                         beta_y=hp.beta_y, beta_z=hp.beta_z, l2_res=hp.l2_res,
                         compute_dtype=hp.compute_dtype,
                         fused_rollout=hp.fused_rollout)

    def step_body(ts: TrainState, x):
        rng = jax.random.fold_in(ts.rng, ts.step)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            ts.params, ts.bn_state, x, rng)
        updates, opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        metrics = {
            "loss": loss, "nll": aux.nll, "kl_y_0": aux.kl_y_0,
            "kl_z": aux.kl_z, "l2_res": aux.l2_res, "lr": sched(ts.step),
        }
        return TrainState(params, aux.state, opt_state, ts.step + 1, ts.rng), metrics

    if steps_per_call == 1:
        return partial(jax.jit, donate_argnums=(0,),
                       compiler_options=compiler_options_from_env())(step_body)

    assert steps_per_call > 1

    @partial(jax.jit, donate_argnums=(0,),
             compiler_options=compiler_options_from_env())
    def train_multi_step(ts: TrainState, xs):
        ts, metrics = jax.lax.scan(step_body, ts, xs)
        return ts, jax.tree.map(lambda m: m[-1], metrics)

    return train_multi_step


def make_eval_batch(cfg, hp, nt, n_samples=None):
    """Builds the jitted best-of-N validation function for sequences of
    length nt (static). Returns per-video prediction PSNR of the best sample,
    best selected by all-frame PSNR (reference train.py:176-186)."""
    n_samples = n_samples or hp.n_samples_test
    chunk = min(hp.val_samples_chunk, n_samples)
    assert n_samples % chunk == 0, "n_samples_test must be divisible by chunk"
    n_chunks = n_samples // chunk

    @jax.jit
    def eval_batch(params, bn_state, x, key):
        from srvp_tpu.data.device_compose import materialize
        x = materialize(x, cfg.nx)
        x_inf = x[: hp.nt_cond]

        def sample_metrics(k):
            out = srvp.forward(cfg, params, bn_state, x_inf, nt,
                               oversampling=hp.oversampling, rng=k,
                               train=False, compute_dtype=hp.compute_dtype)
            psnr = frame_psnr(out.x_, x)                       # (nt, B, C)
            return psnr.mean(axis=(0, 2)), psnr[hp.nt_cond:].mean(axis=(0, 2))

        keys = jax.random.split(key, n_samples).reshape(n_chunks, chunk, -1)
        all_p, pred_p = jax.lax.map(jax.vmap(sample_metrics), keys)
        all_p = all_p.reshape(n_samples, -1)                   # (S, B)
        pred_p = pred_p.reshape(n_samples, -1)
        best = jnp.argmax(all_p, axis=0)                       # (B,)
        return jnp.take_along_axis(pred_p, best[None], axis=0)[0]

    return eval_batch


def evaluate(eval_batch_fn, params, bn_state, val_iter, n_iter_test, key,
             shard_fn=None, pad_to=1):
    """Runs validation over n_iter_test batches; returns -mean pred PSNR
    (lower is better, drives best-model selection; reference train.py:132-189).

    `pad_to` > 1 pads ragged batches up to that multiple (repeating the last
    video) so they still shard over the device mesh; the padded tail is
    sliced off the per-video metrics before averaging."""
    from srvp_tpu.parallel import pad_to_multiple
    total, n = 0.0, 0
    for j, batch in enumerate(val_iter):
        if j >= n_iter_test:
            break
        n_valid = None
        if pad_to > 1:
            batch, n_valid = pad_to_multiple(batch, pad_to, batch_axis=1)
        if shard_fn is not None:
            x = shard_fn(batch)
        elif isinstance(batch, dict):
            x = {k_: jnp.asarray(v) for k_, v in batch.items()}
        else:
            x = jnp.asarray(batch)
        k = jax.random.fold_in(key, j)
        pred_psnr = eval_batch_fn(params, bn_state, x, k)
        if n_valid is not None:
            pred_psnr = pred_psnr[:n_valid]
        total += float(jnp.mean(pred_psnr)) * pred_psnr.shape[0]
        n += pred_psnr.shape[0]
    return -total / max(n, 1)
