"""SRVP model: stochastic latent residual video prediction, TPU-native.

Functional re-design of the reference model
(/root/reference/module/srvp.py:29-470). Key architectural differences from
the torch original, chosen for XLA/TPU:

  * The Euler rollout (`generate`) is a single `lax.scan` over
    oversampling*(nt-1) substeps instead of a Python loop
    (reference srvp.py:377-405). The per-step decisions — "new integer frame"
    (resample z) and "observation available" (posterior vs prior z) — are
    STATIC per (nt, n_euler_steps, len(hx)) and become precomputed boolean
    scan inputs resolved with `jnp.where`, so one compiled program covers the
    whole rollout with no data-dependent control flow.
  * Time is folded into the batch axis for all frame-wise convs
    (reference srvp.py:174-180, 213-219), keeping conv batches large for the
    MXU.
  * Randomness is explicit: every stochastic op takes a PRNG key; the
    per-example random skip frame (srvp.py:183-187) and per-example random
    frame subsets for the content variable (srvp.py:244-248, sampling without
    replacement) use `jax.random.permutation` under `vmap`.
  * Latent-space math runs in float32 regardless of the conv compute dtype
    (bf16-safe training).

State-space recap: content w (perm.-invariant over frames), initial state
y_1 ~ q(y|x_{1:nt_inf}), dynamics y' = y + dt * f(y, z), z ~ q(z|LSTM(hx)_t)
when observed else p(z|y).
"""

import dataclasses
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from srvp_tpu.models import conv as convnets
from srvp_tpu.models import lstm as lstmlib
from srvp_tpu.models import mlp as mlplib
from srvp_tpu.models.layers import linear_apply
from srvp_tpu.ops import dists
from srvp_tpu.ops import init as winit


@dataclasses.dataclass(frozen=True)
class SRVPConfig:
    """Static model hyperparameters (mirrors reference __init__ args,
    srvp.py:76-137)."""
    nx: int = 64          # frame width/height
    nc: int = 1           # channels
    nf: int = 64          # first-conv filters
    nhx: int = 128        # frame encoding size
    ny: int = 20          # state dimension
    nz: int = 20          # auxiliary variable dimension
    skipco: bool = False  # encoder->decoder skip connections
    nt_inf: int = 5       # frames used to infer y_1 / w
    nh_inf: int = 256     # inference MLP hidden size
    nlayers_inf: int = 3  # inference MLP layers
    nh_res: int = 512     # dynamics MLP hidden size
    nlayers_res: int = 4  # dynamics MLP layers
    archi: str = "dcgan"  # 'dcgan' | 'vgg'

    def encoder_spec(self):
        return convnets.encoder_spec(self.archi, self.nc, self.nhx, self.nf)

    def decoder_spec(self):
        return convnets.decoder_spec(
            self.archi, self.nc, self.nh_inf + self.ny, self.nf, self.skipco)


class GenerateOutput(NamedTuple):
    y: jnp.ndarray                       # (L, B, ny); L = nt or (nt-1)*o + 1
    z: Optional[jnp.ndarray]             # (nt-1, B, nz) or None
    q_z_params: Optional[jnp.ndarray]    # (n_obs, B, 2nz) or None
    p_z_params: Optional[jnp.ndarray]    # (nt-1, B, 2nz) or None
    res: jnp.ndarray                     # (o*(nt-1), B, ny)


class ForwardOutput(NamedTuple):
    x_: jnp.ndarray                      # (L, B, H, W, C) in [0, 1]
    y: jnp.ndarray
    z: Optional[jnp.ndarray]
    w: jnp.ndarray                       # (B, nh_inf)
    q_y_0_params: jnp.ndarray            # (B, 2ny)
    q_z_params: Optional[jnp.ndarray]
    p_z_params: Optional[jnp.ndarray]
    res: jnp.ndarray
    state: dict                          # updated batch-norm state


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init(key, cfg: SRVPConfig, res_gain: float = 1.41):
    """Builds (params, state), reproducing the reference init split
    (srvp.py:139-154): normal(0.02) encoder/decoder, orthogonal(res_gain)
    dynamics, torch defaults elsewhere."""
    keys = jax.random.split(key, 9)
    enc_stages, enc_last = cfg.encoder_spec()
    dec_first, dec_stages = cfg.decoder_spec()
    enc_p, enc_s = convnets.encoder_init(keys[0], enc_stages, enc_last)
    dec_p, dec_s = convnets.decoder_init(keys[1], dec_first, dec_stages)
    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "w_proj": winit.linear_default(keys[2], cfg.nhx, cfg.nh_inf),
        "w_inf": winit.linear_default(keys[3], cfg.nh_inf, cfg.nh_inf),
        "q_y": mlplib.mlp_init(keys[4], cfg.nhx * cfg.nt_inf, cfg.nh_inf,
                               cfg.ny * 2, cfg.nlayers_inf),
        "inf_z": lstmlib.lstm_init(keys[5], cfg.nhx, cfg.nh_inf),
        "q_z": winit.linear_default(keys[6], cfg.nh_inf, cfg.nz * 2),
        "p_z": mlplib.mlp_init(keys[7], cfg.ny, cfg.nh_res, cfg.nz * 2,
                               cfg.nlayers_res),
        "dynamics": mlplib.mlp_init(keys[8], cfg.ny + cfg.nz, cfg.nh_res,
                                    cfg.ny, cfg.nlayers_res,
                                    init_type="orthogonal", init_gain=res_gain),
    }
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


# ---------------------------------------------------------------------------
# Encode / decode
# ---------------------------------------------------------------------------

def encode(cfg, params, state, x, *, train, rng=None):
    """Frame-wise encoding. x: (T, B, H, W, C) -> (hx (T,B,nhx), skips, state').

    Skip connections come from a per-example random frame when training and
    from the last frame otherwise (reference srvp.py:181-192).

    Time is folded into the batch BATCH-MAJOR ((b*nt + t), not (t*bsz + b)):
    under pjit with the example axis sharded over the `data` mesh, a merged
    dimension is only partitionable when the sharded dim is the major
    partner — the (t, b) fold made GSPMD all-gather the batch and run every
    conv replicated on all devices (verified from the partitioned HLO).
    """
    enc_stages, enc_last = cfg.encoder_spec()
    nt, bsz = x.shape[0], x.shape[1]
    x_flat = x.swapaxes(0, 1).reshape((bsz * nt,) + x.shape[2:])
    hx_flat, skips, enc_state = convnets.encoder_apply(
        params["encoder"], state["encoder"], enc_stages, enc_last, x_flat, train)
    hx = hx_flat.reshape(bsz, nt, cfg.nhx).swapaxes(0, 1)
    if cfg.skipco:
        out_skips = []
        if train:
            # Per-example random frame, selected with a one-hot masked sum:
            # one vectorized pass over the stage output. (take_along_axis
            # here lowers to a flattened scalar gather — measured 975 ms on
            # the KTH step — and per-row dynamic slices don't batch.)
            t = jax.random.randint(rng, (bsz,), 0, nt)
            onehot = jax.nn.one_hot(t, nt)
            sel_mode = os.environ.get("SRVP_SKIP_SELECT", "foldmm")
            if sel_mode == "einsum":
                # experiment: contract the frame axis on the MXU instead of
                # mask+reduce on the VPU (perf experiment, bit-compatible:
                # one nonzero product per output). Measured neutral vs
                # mask-sum (291.5 vs 291.3 ms KTH step) — XLA lowers the
                # batched matvec to the same mul+reduce after the 5-D
                # reshape, which is where the cost actually lives.
                for s in skips:
                    s = s.reshape((bsz, nt) + s.shape[1:])
                    out_skips.append(jnp.einsum(
                        "bt,bt...->b...", onehot.astype(s.dtype), s))
            elif sel_mode == "foldmm":
                # Select directly on the FOLDED batch axis with a one-hot
                # matmul: out[b] = sum_q S[b, q] s[q] with
                # S[b, b*nt+t_b] = 1. No (bsz, nt, ...) reshape of the big
                # activation — that reshape is NOT a bitcast under XLA's
                # batch-minor conv layout and costs a full relayout copy
                # each way (measured ~11 ms/step at the 64x64x64 site on
                # KTH). One nonzero product per output => bit-equal to the
                # mask+reduce path.
                sel = jax.nn.one_hot(jnp.arange(bsz) * nt + t, bsz * nt)
                for s in skips:
                    out_skips.append(
                        jnp.einsum("bq,q...->b...", sel.astype(s.dtype), s))
            else:
                for s in skips:
                    s = s.reshape((bsz, nt) + s.shape[1:])
                    m = onehot.reshape((bsz, nt) + (1,) * (s.ndim - 2))
                    out_skips.append((s * m.astype(s.dtype)).sum(axis=1))
        else:
            # Eval: last frame per video — a STATIC strided slice on the
            # folded batch axis (rows nt-1, 2nt-1, ...), no (bsz, nt, ...)
            # reshape of the big activation. Preferred over the training
            # path's one-hot matmul here: a contraction would propagate a
            # non-finite value in ANY frame's activation into every video's
            # skip (0 * inf = nan), whereas the slice only reads the frames
            # it returns — eval of a damaged checkpoint stays per-video.
            for s in skips:
                out_skips.append(s[nt - 1::nt])
        skips = out_skips
    else:
        skips = None
    new_state = dict(state)
    new_state["encoder"] = enc_state
    return hx, skips, new_state


def decode(cfg, params, state, w, y, skips, *, train, sigmoid=True):
    """Decodes (w, y_t) pairs into frames. w: (B, nh_inf), y: (L, B, ny).

    Returns ((L, B, H, W, C), state'). Content w and skips are broadcast over
    time (reference srvp.py:195-227).
    """
    dec_first, dec_stages = cfg.decoder_spec()
    nt, bsz = y.shape[0], y.shape[1]
    # Batch-major time fold — see encode() for the GSPMD rationale.
    y_flat = y.swapaxes(0, 1).reshape(bsz * nt, cfg.ny)
    w_flat = jnp.broadcast_to(w[:, None], (bsz, nt, cfg.nh_inf)) \
        .reshape(bsz * nt, cfg.nh_inf)
    dec_inp = jnp.concatenate([w_flat, y_flat.astype(w_flat.dtype)], axis=-1)
    x_flat, dec_state = convnets.decoder_apply(
        params["decoder"], state["decoder"], dec_first, dec_stages,
        dec_inp, skips, train, sigmoid=sigmoid, nt=nt)
    x_ = x_flat.reshape((bsz, nt) + x_flat.shape[1:]).swapaxes(0, 1)
    new_state = dict(state)
    new_state["decoder"] = dec_state
    return x_, new_state


# ---------------------------------------------------------------------------
# Inference networks
# ---------------------------------------------------------------------------

def infer_w(cfg, params, hx, *, train, rng=None):
    """Permutation-invariant content variable (reference srvp.py:229-256).

    Training: nt_inf frames sampled per example WITHOUT replacement
    (per-column randperm). Eval: last nt_inf frames.
    """
    nt, bsz = hx.shape[0], hx.shape[1]
    if train:
        keys = jax.random.split(rng, bsz)
        perms = jax.vmap(lambda k: jax.random.permutation(k, nt)[: cfg.nt_inf])(keys)
        idx = perms.T[:, :, None]  # (nt_inf, B, 1)
        h = jnp.take_along_axis(hx, jnp.broadcast_to(idx, (cfg.nt_inf, bsz, cfg.nhx)), axis=0)
    else:
        h = hx[-cfg.nt_inf:]
    h = jax.nn.relu(linear_apply(params["w_proj"], h))
    h = h.sum(axis=0)
    return jnp.tanh(linear_apply(params["w_inf"], h))


def infer_y(cfg, params, hx, rng):
    """q(y_1 | x_{1:nt_inf}) (reference srvp.py:258-278). hx: (nt_inf, B, nhx)."""
    bsz = hx.shape[1]
    flat = jnp.transpose(hx, (1, 0, 2)).reshape(bsz, cfg.nt_inf * cfg.nhx)
    q_y_0_params = mlplib.mlp_apply(params["q_y"], flat.astype(jnp.float32))
    y_0 = dists.rsample(q_y_0_params, rng)
    return y_0, q_y_0_params


def infer_z(params, hx_z_t, rng):
    """q(z_t | LSTM(hx)_t) (reference srvp.py:280-298)."""
    q_z_params = linear_apply(params["q_z"], hx_z_t)
    return dists.rsample(q_z_params, rng), q_z_params


# ---------------------------------------------------------------------------
# Rollout
# ---------------------------------------------------------------------------

def rollout_masks(nt, oversampling, nt_hx):
    """Static per-substep decision masks for the Euler rollout.

    Substep k = 1..o*(nt-1) targets integer frame t_data = ceil(k/o); a new z
    is drawn at the first substep of each integer frame and reused for the
    following o-1 substeps (reference srvp.py:377-396).
    """
    o = oversampling
    n_steps = o * (nt - 1)
    step_ids = np.arange(1, n_steps + 1)
    t_data = (step_ids + o - 1) // o
    new_step = (step_ids - 1) % o == 0
    use_post = t_data < nt_hx
    keep_integer = step_ids % o == 0
    return t_data, new_step, use_post, keep_integer


def generate(cfg, params, y_0, hx, nt, *, oversampling=1, rng=None, train=False,
             remove_intermediate=True, hx_z=None, fused_train=False,
             fused_interpret=False):
    """Euler rollout of the latent state as one `lax.scan`.

    y_0: (B, ny). hx: (nt_hx, B, nhx) frame encodings or None (pure prior
    mode, reference test.py:244). nt: number of integer-time states including
    y_0. dt = 1/oversampling. hx_z optionally provides precomputed z-LSTM
    outputs (nt_hx, B, nh_inf) — used by the evaluator to hoist the LSTM out
    of the folded sample axis; when given, hx may be None and only
    hx_z.shape[0] matters.

    Returns GenerateOutput; components are float32.
    """
    assert oversampling >= 1
    dt = 1.0 / oversampling
    bsz = y_0.shape[0]
    nt_hx = (hx_z.shape[0] if hx_z is not None
             else (0 if hx is None else hx.shape[0]))
    t_data, new_step, use_post, keep_integer = rollout_masks(nt, oversampling, nt_hx)
    n_steps = len(t_data)
    if train:
        # Training requires every new z to be inferred from an observation
        # (reference srvp.py:391 asserts not self.training in the prior branch).
        assert bool(np.all(use_post[new_step])), \
            "training rollout needs observations for every generated frame"
    if n_steps == 0:
        y = y_0[None].astype(jnp.float32)
        return GenerateOutput(y, None, None, None,
                              jnp.zeros((0, bsz, cfg.ny), jnp.float32))

    y_0 = y_0.astype(jnp.float32)

    # LSTM pass over the frame encodings for posterior z (reference srvp.py:364-368).
    if nt_hx > 0:
        if hx_z is None:
            hx_z = lstmlib.lstm_apply(params["inf_z"], hx.astype(jnp.float32))
        # Per-substep gather of the LSTM output used when an observation exists.
        gather_idx = np.clip(t_data, 0, nt_hx - 1)
        hx_z_steps = hx_z[gather_idx]
    else:
        hx_z_steps = jnp.zeros((n_steps, bsz, cfg.nh_inf), jnp.float32)

    keys = jax.random.split(rng, n_steps)

    if fused_train and train and bool(np.all(use_post)):
        # weights-stationary Pallas path with custom VJP (same key schedule
        # as the scan below: eps_k = normal(split(keys[k])[1]))
        from srvp_tpu.ops.pallas.rollout_train import make_train_rollout
        k_pos = jax.vmap(lambda k: jax.random.split(k)[1])(keys)
        eps = jax.vmap(lambda k: jax.random.normal(k, (bsz, cfg.nz)))(k_pos)
        fused_fn = make_train_rollout(cfg.ny, cfg.nz, cfg.nh_inf, cfg.nh_res,
                                      n_steps, oversampling,
                                      interpret=fused_interpret)
        ys, res, q_pars, p_pars, zs = fused_fn(
            params["q_z"], params["p_z"], params["dynamics"],
            y_0, hx_z_steps, eps)
        if remove_intermediate:
            keep_idx = np.flatnonzero(keep_integer)
            y = jnp.concatenate([y_0[None], ys[keep_idx]], axis=0)
        else:
            y = jnp.concatenate([y_0[None], ys], axis=0)
        new_idx = np.flatnonzero(new_step)
        return GenerateOutput(y, zs[new_idx], q_pars[new_idx],
                              p_pars[new_idx], res)

    new_step_f = jnp.asarray(new_step)
    use_post_f = jnp.asarray(use_post)

    def step(carry, inp):
        y, z_prev = carry
        key, hxz_t, is_new, is_post = inp
        k_pri, k_pos = jax.random.split(key)
        p_par = mlplib.mlp_apply(params["p_z"], y)
        q_par = linear_apply(params["q_z"], hxz_t)
        z_pri = dists.rsample(p_par, k_pri)
        z_pos = dists.rsample(q_par, k_pos)
        z_new = jnp.where(is_post, z_pos, z_pri)
        z = jnp.where(is_new, z_new, z_prev)
        res = dt * mlplib.mlp_apply(params["dynamics"],
                                    jnp.concatenate([y, z], axis=-1))
        y_next = y + res
        return (y_next, z), (y_next, res, p_par, q_par, z)

    z0 = jnp.zeros((bsz, cfg.nz), jnp.float32)
    # unroll=2: the per-step MLPs are tiny, so halving loop overhead wins
    # ~3% of the whole training step at identical numerics
    (_, _), (ys, res, p_pars, q_pars, zs) = lax.scan(
        step, (y_0, z0), (keys, hx_z_steps, new_step_f, use_post_f), unroll=2)

    if remove_intermediate:
        keep_idx = np.flatnonzero(keep_integer)
        y = jnp.concatenate([y_0[None], ys[keep_idx]], axis=0)
    else:
        y = jnp.concatenate([y_0[None], ys], axis=0)

    new_idx = np.flatnonzero(new_step)
    post_idx = np.flatnonzero(new_step & use_post)
    z = zs[new_idx] if len(new_idx) else None
    p_z_params = p_pars[new_idx] if len(new_idx) else None
    q_z_params = q_pars[post_idx] if len(post_idx) else None
    return GenerateOutput(y, z, q_z_params, p_z_params, res)


def generate_prior_fused(cfg, params, y_0, nt, *, oversampling=1, rng=None,
                         remove_intermediate=True, interpret=False):
    """Pure-prior rollout through the fused Pallas kernel
    (srvp_tpu.ops.pallas.rollout): weights stay VMEM-resident across all
    Euler substeps. Key schedule matches `generate`'s scan, so both paths
    sample identical trajectories for the same rng.

    Returns GenerateOutput with z/q/p params None (the test.py generation
    path only consumes y, reference test.py:244).
    """
    from srvp_tpu.ops.pallas.rollout import prior_rollout_fused

    n_steps = oversampling * (nt - 1)
    bsz = y_0.shape[0]
    if n_steps == 0:
        return GenerateOutput(y_0[None].astype(jnp.float32), None, None, None,
                              jnp.zeros((0, bsz, cfg.ny), jnp.float32))
    keys = jax.random.split(rng, n_steps)
    k_pri = jax.vmap(lambda k: jax.random.split(k)[0])(keys)
    eps = jax.vmap(lambda k: jax.random.normal(k, (bsz, cfg.nz)))(k_pri)
    ys = prior_rollout_fused(params["p_z"], params["dynamics"],
                             y_0.astype(jnp.float32), eps, cfg.ny, cfg.nz,
                             oversampling=oversampling, interpret=interpret)
    y_all = jnp.concatenate([y_0[None].astype(jnp.float32), ys], axis=0)
    res = ys - y_all[:-1]
    if remove_intermediate:
        _, _, _, keep = rollout_masks(nt, oversampling, 0)
        keep_idx = np.flatnonzero(keep)
        y = jnp.concatenate([y_all[:1], ys[keep_idx]], axis=0)
    else:
        y = y_all
    return GenerateOutput(y, None, None, None, res)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------

def forward(cfg, params, state, x, nt, *, oversampling=1, rng=None, train=False,
            remove_intermediate=True, compute_dtype=jnp.float32,
            fused_rollout=False, fused_interpret=False):
    """Full model pass (reference srvp.py:415-470).

    x: (T, B, H, W, C) floats in [0, 1]. Returns ForwardOutput with frames of
    length nt (or (nt-1)*oversampling + 1 when remove_intermediate=False).
    fused_rollout routes the training rollout through the custom-VJP Pallas
    kernel (srvp_tpu/ops/pallas/rollout_train.py).
    """
    k_skip, k_w, k_y, k_gen = jax.random.split(rng, 4)
    x = x.astype(compute_dtype)
    hx, skips, state = encode(cfg, params, state, x, train=train, rng=k_skip)
    hx32 = hx.astype(jnp.float32)
    w = infer_w(cfg, params, hx32, train=train, rng=k_w)
    y_0, q_y_0_params = infer_y(cfg, params, hx32[: cfg.nt_inf], k_y)
    gen = generate(cfg, params, y_0, hx32, nt, oversampling=oversampling,
                   rng=k_gen, train=train, remove_intermediate=remove_intermediate,
                   fused_train=fused_rollout, fused_interpret=fused_interpret)
    x_, state = decode(cfg, params, state, w.astype(compute_dtype),
                       gen.y.astype(compute_dtype), skips, train=train)
    return ForwardOutput(x_, gen.y, gen.z, w, q_y_0_params, gen.q_z_params,
                         gen.p_z_params, gen.res, state)
