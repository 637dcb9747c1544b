"""Pallas TPU kernels: fused TRAINING-mode latent rollout with custom VJP.

The training rollout (all-posterior z, reference srvp.py:377-405 with
observations for every frame) is a sequential chain of small MLPs — exactly
the latency-bound pattern the weights-stationary layout fixes (see
rollout.py for the inference-mode analog). Training additionally needs
gradients, so this module implements the backward pass as a second Pallas
kernel and ties both together with jax.custom_vjp:

  forward:  per substep k (z reused within a frame for oversampling o):
      q_par_k = hxz_k @ Wq + bq
      z_k     = new_k ? loc_k + eps_k * (softplus(raw_k)+1e-8) : z_{k-1}
      p_par_k = MLP_p(y_k)
      y_{k+1} = y_k + dt * MLP_d([y_k, z_k])
    Outputs (y, res, q_par, p_par, z per substep) plus stashed hidden
    pre-activations for both MLPs (streamed to HBM).

  backward: reverse-order grid over substeps; carries dL/dy and the reused-z
    gradient in VMEM scratch; accumulates all weight gradients in VMEM f32
    scratch and emits dL/dy_0 and dL/dhxz.

All feature dims are lane-padded (multiples of 128) with inert zero padding;
the q head is repacked so loc/raw split at nz_pad (matching rollout.py).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from srvp_tpu.ops.pallas.rollout import (
    LANE, SUBLANE, _pad_to, _repack_split_output, _round_up, pack_mlp)


def _relu(x):
    return jnp.maximum(x, 0.0)


def _mlp_fwd_stash(refs, h, stash_ref, nh):
    """Pre-activation MLP; writes hidden PRE-activations into stash_ref
    (1, B, (L-1)*nh) for the backward pass."""
    for il, (w_ref, b_ref) in enumerate(refs):
        if il > 0:
            stash_ref[0, :, (il - 1) * nh:il * nh] = h
            h = _relu(h)
        h = jnp.dot(h, w_ref[:, :], preferred_element_type=jnp.float32) \
            + b_ref[:, :]
    return h


def _mlp_bwd(refs, grad_refs, stash, x_in, g, nh):
    """Backward through a pre-activation MLP given hidden pre-activations.

    refs/grad_refs: [(W, b)] / [(dW, db)] VMEM refs; stash: (B, (L-1)*nh)
    pre-activations; x_in: (B, in) layer-0 input; g: (B, out) cotangent.
    Accumulates into grad_refs and returns dL/dx_in.
    """
    n_layers = len(refs)
    for il in range(n_layers - 1, -1, -1):
        w_ref, _ = refs[il]
        dw_ref, db_ref = grad_refs[il]
        if il == 0:
            a_prev = x_in
        else:
            h_prev = stash[:, (il - 1) * nh:il * nh]
            a_prev = _relu(h_prev)
        dw_ref[:, :] += jnp.dot(a_prev.T, g, preferred_element_type=jnp.float32)
        db_ref[0, :] += jnp.sum(g, axis=0)
        g = jnp.dot(g, w_ref[:, :].T, preferred_element_type=jnp.float32)
        if il > 0:
            g = g * (h_prev > 0.0).astype(jnp.float32)
    return g


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(o, dt, ny, nz, ny_pad, nz_pad, yz_pad, nh, n_pz, n_dyn, *refs):
    # grid=(n_bt, K); refs: y0, hxz_t, eps_t, [q w,b], [pz w,b]*, [dyn w,b]*,
    # outs: ys_t, res_t, qpar_t, ppar_t, zs_t, stash_p_t, stash_d_t,
    # scratch: y_scr, z_scr
    it = iter(range(len(refs)))
    y0_ref = refs[next(it)]
    hxz_ref = refs[next(it)]
    eps_ref = refs[next(it)]
    q_refs = (refs[next(it)], refs[next(it)])
    pz_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_pz)]
    dyn_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_dyn)]
    ys_ref = refs[next(it)]
    res_ref = refs[next(it)]
    qpar_ref = refs[next(it)]
    ppar_ref = refs[next(it)]
    zs_ref = refs[next(it)]
    stash_p_ref = refs[next(it)]
    stash_d_ref = refs[next(it)]
    y_scr = refs[next(it)]
    z_scr = refs[next(it)]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        y_scr[:, :] = y0_ref[:, :]
        z_scr[:, :] = jnp.zeros_like(z_scr)

    bsz = y0_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, nz_pad), 1)
    z_mask = (col < nz).astype(jnp.float32)

    y = y_scr[:, :]
    q_par = jnp.dot(hxz_ref[0, :, :], q_refs[0][:, :],
                    preferred_element_type=jnp.float32) + q_refs[1][:, :]
    loc = q_par[:, :nz_pad]
    raw = q_par[:, nz_pad:]
    scale = (jax.nn.softplus(raw) + 1e-8) * z_mask
    z_new = loc * z_mask + eps_ref[0, :, :] * scale
    is_new = (t % o) == 0
    z = jnp.where(is_new, z_new, z_scr[:, :])
    z_scr[:, :] = z

    p_par = _mlp_fwd_stash(pz_refs, y, stash_p_ref, nh)

    yz = jnp.concatenate([y[:, :ny], z[:, :nz]], axis=1)
    yz = jnp.pad(yz, ((0, 0), (0, yz_pad - (ny + nz))))
    r = _mlp_fwd_stash(dyn_refs, yz, stash_d_ref, nh)
    res = dt * r
    y_new = y + res
    y_scr[:, :] = y_new

    ys_ref[0, :, :] = y_new
    res_ref[0, :, :] = res
    qpar_ref[0, :, :] = q_par
    ppar_ref[0, :, :] = p_par
    zs_ref[0, :, :] = z


# ---------------------------------------------------------------------------
# Backward kernel (reverse-order grid)
# ---------------------------------------------------------------------------

def _bwd_kernel(o, dt, ny, nz, ny_pad, nz_pad, yz_pad, nh, n_steps,
                n_pz, n_dyn, *refs):
    # grid=(n_bt, K) with index maps reversed in time (block j -> step K-1-j)
    it = iter(range(len(refs)))
    y0_ref = refs[next(it)]
    hxz_ref = refs[next(it)]
    eps_ref = refs[next(it)]
    q_refs = (refs[next(it)], refs[next(it)])
    pz_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_pz)]
    dyn_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_dyn)]
    ys_ref = refs[next(it)]            # step k-1 block: y_k (input state)
    qpar_ref = refs[next(it)]
    zs_ref = refs[next(it)]
    stash_p_ref = refs[next(it)]
    stash_d_ref = refs[next(it)]
    cot_ys_ref = refs[next(it)]
    cot_res_ref = refs[next(it)]
    cot_qpar_ref = refs[next(it)]
    cot_ppar_ref = refs[next(it)]
    # outputs
    gy0_ref = refs[next(it)]
    ghxz_ref = refs[next(it)]
    gq_refs = (refs[next(it)], refs[next(it)])
    gpz_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_pz)]
    gdyn_refs = [(refs[next(it)], refs[next(it)]) for _ in range(n_dyn)]
    # scratch
    gy_scr = refs[next(it)]
    gz_scr = refs[next(it)]

    j = pl.program_id(1)
    k = n_steps - 1 - j  # actual substep

    @pl.when(j == 0)
    def _():
        gy_scr[:, :] = jnp.zeros_like(gy_scr)
        gz_scr[:, :] = jnp.zeros_like(gz_scr)

    # weight-grad accumulators are SHARED across batch tiles: zero once
    @pl.when((j == 0) & (pl.program_id(0) == 0))
    def _():
        for dw, db in [gq_refs] + gpz_refs + gdyn_refs:
            dw[:, :] = jnp.zeros_like(dw)
            db[:, :] = jnp.zeros_like(db)

    bsz = y0_ref.shape[0]
    # y_k (the INPUT state of step k): ys[k-1], or y0 at k == 0. The ys block
    # spec maps j -> max(k-1, 0); select y0 when k == 0.
    y_in = jnp.where(k == 0, y0_ref[:, :], ys_ref[0, :, :])
    z_k = zs_ref[0, :, :]
    q_par = qpar_ref[0, :, :]
    raw = q_par[:, nz_pad:]
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, nz_pad), 1)
    z_mask = (col < nz).astype(jnp.float32)

    gy_k1 = gy_scr[:, :] + cot_ys_ref[0, :, :]
    # res output = dt * r and y_{k+1} = y_k + res
    g_r = dt * (cot_res_ref[0, :, :] + gy_k1)

    # dynamics MLP backward
    yz = jnp.concatenate([y_in[:, :ny], z_k[:, :nz]], axis=1)
    yz = jnp.pad(yz, ((0, 0), (0, yz_pad - (ny + nz))))
    g_yz = _mlp_bwd(dyn_refs, gdyn_refs, stash_d_ref[0, :, :], yz, g_r, nh)
    g_y_dyn = jnp.pad(g_yz[:, :ny], ((0, 0), (0, ny_pad - ny)))
    g_z_dyn = jnp.pad(g_yz[:, ny:ny + nz], ((0, 0), (0, nz_pad - nz)))

    # z gradient: from dynamics + carried reuse gradient from substep k+1
    is_new = (k % o) == 0
    g_z_total = g_z_dyn + gz_scr[:, :]
    # posterior reparameterization (only where a new z was drawn)
    scale_grad = eps_ref[0, :, :] * jax.nn.sigmoid(raw) * z_mask
    g_loc = g_z_total * z_mask
    g_raw = g_z_total * scale_grad
    g_qpar_z = jnp.concatenate([g_loc, g_raw], axis=1)
    g_qpar = jnp.where(is_new, g_qpar_z, jnp.zeros_like(g_qpar_z)) \
        + cot_qpar_ref[0, :, :]
    # carry: if this step REUSED z, pass the whole z grad to step k-1
    gz_scr[:, :] = jnp.where(is_new, jnp.zeros_like(g_z_total), g_z_total)

    # q linear backward
    hxz = hxz_ref[0, :, :]
    gq_refs[0][:, :] += jnp.dot(hxz.T, g_qpar,
                                preferred_element_type=jnp.float32)
    gq_refs[1][0, :] += jnp.sum(g_qpar, axis=0)
    ghxz_ref[0, :, :] = jnp.dot(g_qpar, q_refs[0][:, :].T,
                                preferred_element_type=jnp.float32)

    # p_z MLP backward (output only feeds the KL cotangent)
    g_y_p = _mlp_bwd(pz_refs, gpz_refs, stash_p_ref[0, :, :], y_in,
                     cot_ppar_ref[0, :, :], nh)

    gy = gy_k1 + g_y_dyn + g_y_p
    gy_scr[:, :] = gy

    @pl.when(j == n_steps - 1)
    def _():
        gy0_ref[:, :] = gy


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

def make_train_rollout(ny, nz, nh_inf, nh_res, n_steps, oversampling,
                       interpret=False, batch_tile=128):
    """Builds the fused training rollout with a custom VJP.

    Returns fn(q_params, pz_params, dyn_params, y_0, hxz, eps) ->
      (ys (K,B,ny), res (K,B,ny), q_pars (K,B,2nz), p_pars (K,B,2nz),
       zs (K,B,nz))
    where hxz (K,B,nh_inf) are the per-substep z-LSTM outputs and eps
    (K,B,nz) the posterior noise draws. All-posterior (training) mode only.
    """
    o = oversampling
    dt = 1.0 / o
    ny_pad = _round_up(ny, LANE)
    nz_pad = _round_up(nz, LANE)
    yz_pad = _round_up(ny + nz, LANE)
    p_pad = _round_up(2 * nz, LANE)
    nh_inf_pad = _round_up(nh_inf, LANE)
    nh = _round_up(nh_res, LANE)
    K = n_steps

    def _pack(q_params, pz_params, dyn_params):
        q_w, q_b = _repack_split_output(q_params, nz, nz_pad)
        pz = [(w, b.reshape(1, -1)) for w, b in pack_mlp(pz_params)]
        dyn = [(w, b.reshape(1, -1)) for w, b in pack_mlp(dyn_params)]
        return (q_w, q_b.reshape(1, -1)), pz, dyn

    def _pad_inputs(y_0, hxz, eps, b_tile, b_pad):
        y0p = _pad_to(_pad_to(y_0.astype(jnp.float32), b_pad, 0), ny_pad, 1)
        hxzp = _pad_to(_pad_to(hxz.astype(jnp.float32), b_pad, 1), nh_inf_pad, 2)
        epsp = _pad_to(_pad_to(eps.astype(jnp.float32), b_pad, 1), nz_pad, 2)
        return y0p, hxzp, epsp

    def _tiles(bsz):
        b8 = _round_up(bsz, SUBLANE)
        n_bt = -(-b8 // batch_tile)
        b_tile = _round_up(-(-b8 // n_bt), SUBLANE)
        return n_bt, b_tile, n_bt * b_tile

    def _weight_specs(packed):
        specs, arrays = [], []
        for w, b in packed:
            arrays.extend([w, b])
            specs.extend([
                pl.BlockSpec(w.shape, lambda bt, j: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(b.shape, lambda bt, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ])
        return specs, arrays

    def _step_spec(feat, b_tile, reverse=False, shift=0):
        if reverse:
            def imap(bt, j, K=K, shift=shift):
                return (jnp.maximum(K - 1 - j - shift, 0), bt, 0)
        else:
            def imap(bt, j):
                return (j, bt, 0)
        return pl.BlockSpec((1, b_tile, feat), imap, memory_space=pltpu.VMEM)

    n_pz_layers = None  # set at first call

    def fwd_impl(q_params, pz_params, dyn_params, y_0, hxz, eps):
        bsz = y_0.shape[0]
        n_bt, b_tile, b_pad = _tiles(bsz)
        (qw, qb), pz, dyn = _pack(q_params, pz_params, dyn_params)
        y0p, hxzp, epsp = _pad_inputs(y_0, hxz, eps, b_tile, b_pad)
        n_pz, n_dyn = len(pz), len(dyn)
        w_specs, w_arrays = _weight_specs([(qw, qb)] + pz + dyn)

        stash_w_p = (n_pz - 1) * nh
        stash_w_d = (n_dyn - 1) * nh
        kernel = partial(_fwd_kernel, o, dt, ny, nz, ny_pad, nz_pad, yz_pad,
                         nh, n_pz, n_dyn)
        outs = pl.pallas_call(
            kernel,
            grid=(n_bt, K),
            out_shape=[
                jax.ShapeDtypeStruct((K, b_pad, ny_pad), jnp.float32),      # ys
                jax.ShapeDtypeStruct((K, b_pad, ny_pad), jnp.float32),      # res
                jax.ShapeDtypeStruct((K, b_pad, 2 * nz_pad), jnp.float32),  # qpar
                jax.ShapeDtypeStruct((K, b_pad, p_pad), jnp.float32),       # ppar
                jax.ShapeDtypeStruct((K, b_pad, nz_pad), jnp.float32),      # zs
                jax.ShapeDtypeStruct((K, b_pad, max(stash_w_p, 1)), jnp.float32),
                jax.ShapeDtypeStruct((K, b_pad, max(stash_w_d, 1)), jnp.float32),
            ],
            in_specs=[
                pl.BlockSpec((b_tile, ny_pad), lambda bt, j: (bt, 0),
                             memory_space=pltpu.VMEM),          # y0
                _step_spec(nh_inf_pad, b_tile),                 # hxz
                _step_spec(nz_pad, b_tile),                     # eps
            ] + w_specs,
            out_specs=[
                _step_spec(ny_pad, b_tile),
                _step_spec(ny_pad, b_tile),
                _step_spec(2 * nz_pad, b_tile),
                _step_spec(p_pad, b_tile),
                _step_spec(nz_pad, b_tile),
                _step_spec(max(stash_w_p, 1), b_tile),
                _step_spec(max(stash_w_d, 1), b_tile),
            ],
            scratch_shapes=[pltpu.VMEM((b_tile, ny_pad), jnp.float32),
                            pltpu.VMEM((b_tile, nz_pad), jnp.float32)],
            interpret=interpret,
        )(y0p, hxzp, epsp, *w_arrays)
        ys, res, qpar, ppar, zs, stash_p, stash_d = outs
        public = (
            ys[:, :bsz, :ny], res[:, :bsz, :ny],
            jnp.concatenate([qpar[:, :bsz, :nz],
                             qpar[:, :bsz, nz_pad:nz_pad + nz]], axis=-1),
            ppar[:, :bsz, :2 * nz],
            zs[:, :bsz, :nz],
        )
        return public, (qpar, zs, ys, stash_p, stash_d, y0p, hxzp, epsp,
                        q_params, pz_params, dyn_params, bsz)

    def bwd_impl(residuals, cots):
        (qpar, zs, ys, stash_p, stash_d, y0p, hxzp, epsp,
         q_params, pz_params, dyn_params, bsz) = residuals
        cot_ys, cot_res, cot_qpar, cot_ppar, cot_zs = cots
        n_bt, b_tile, b_pad = _tiles(bsz)
        (qw, qb), pz, dyn = _pack(q_params, pz_params, dyn_params)
        n_pz, n_dyn = len(pz), len(dyn)
        w_specs, w_arrays = _weight_specs([(qw, qb)] + pz + dyn)

        def simple_pad(c, feat_pad):
            c = c.astype(jnp.float32)
            out = jnp.zeros((K, b_pad, feat_pad), jnp.float32)
            return out.at[:, :bsz, : c.shape[2]].set(c)

        # q cotangent back to the repacked (loc | raw at nz_pad) layout;
        # fold the unused z cotangent in here as well (z = loc + eps*scale):
        # dL/dloc += cot_zs, dL/draw += cot_zs * eps * sigmoid(raw).
        cot_q_repack = jnp.zeros((K, b_pad, 2 * nz_pad), jnp.float32)
        raw = qpar[:, :bsz, nz_pad:nz_pad + nz]
        eps_used = epsp[:, :bsz, :nz]
        # cot_zs applies only where a new z was drawn (reuse steps replay the
        # SAME z; their cotangents flow via the carry inside the kernel).
        # Returned zs repeats the active z, so cot on reused rows must also
        # reach the draw: fold all of them onto the drawing step.
        new_mask = (np.arange(K) % o == 0)
        cz = cot_zs.astype(jnp.float32)
        # accumulate reuse-step cotangents onto their drawing step
        cz_fold = jnp.zeros_like(cz)
        for k in range(K):
            src = (k // o) * o
            cz_fold = cz_fold.at[src].add(cz[k])
        cz = jnp.where(jnp.asarray(new_mask)[:, None, None], cz_fold, 0.0)
        cot_q_repack = cot_q_repack.at[:, :bsz, :nz].set(
            cot_qpar[..., :nz].astype(jnp.float32) + cz)
        cot_q_repack = cot_q_repack.at[:, :bsz, nz_pad:nz_pad + nz].set(
            cot_qpar[..., nz:].astype(jnp.float32)
            + cz * eps_used * jax.nn.sigmoid(raw))

        cot_ys_p = simple_pad(cot_ys, ny_pad)
        cot_res_p = simple_pad(cot_res, ny_pad)
        cot_ppar_p = simple_pad(cot_ppar, p_pad)

        stash_w_p = max((n_pz - 1) * nh, 1)
        stash_w_d = max((n_dyn - 1) * nh, 1)
        kernel = partial(_bwd_kernel, o, dt, ny, nz, ny_pad, nz_pad, yz_pad,
                         nh, K, n_pz, n_dyn)
        grad_out_shapes = [
            jax.ShapeDtypeStruct((b_pad, ny_pad), jnp.float32),          # gy0
            jax.ShapeDtypeStruct((K, b_pad, nh_inf_pad), jnp.float32),   # ghxz
        ]
        grad_out_specs = [
            pl.BlockSpec((b_tile, ny_pad), lambda bt, j: (bt, 0),
                         memory_space=pltpu.VMEM),
            _step_spec(nh_inf_pad, b_tile, reverse=True),
        ]
        for w, b in [(qw, qb)] + pz + dyn:
            grad_out_shapes.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
            grad_out_shapes.append(jax.ShapeDtypeStruct(b.shape, jnp.float32))
            grad_out_specs.append(pl.BlockSpec(
                w.shape, lambda bt, j: (0, 0), memory_space=pltpu.VMEM))
            grad_out_specs.append(pl.BlockSpec(
                b.shape, lambda bt, j: (0, 0), memory_space=pltpu.VMEM))

        outs = pl.pallas_call(
            kernel,
            grid=(n_bt, K),
            out_shape=grad_out_shapes,
            in_specs=[
                pl.BlockSpec((b_tile, ny_pad), lambda bt, j: (bt, 0),
                             memory_space=pltpu.VMEM),            # y0
                _step_spec(nh_inf_pad, b_tile, reverse=True),     # hxz
                _step_spec(nz_pad, b_tile, reverse=True),         # eps
            ] + w_specs + [
                _step_spec(ny_pad, b_tile, reverse=True, shift=1),   # ys (y_k)
                _step_spec(2 * nz_pad, b_tile, reverse=True),        # qpar
                _step_spec(nz_pad, b_tile, reverse=True),            # zs
                _step_spec(stash_w_p, b_tile, reverse=True),
                _step_spec(stash_w_d, b_tile, reverse=True),
                _step_spec(ny_pad, b_tile, reverse=True),            # cot_ys
                _step_spec(ny_pad, b_tile, reverse=True),            # cot_res
                _step_spec(2 * nz_pad, b_tile, reverse=True),        # cot_qpar
                _step_spec(p_pad, b_tile, reverse=True),             # cot_ppar
            ],
            out_specs=grad_out_specs,
            scratch_shapes=[pltpu.VMEM((b_tile, ny_pad), jnp.float32),
                            pltpu.VMEM((b_tile, nz_pad), jnp.float32)],
            interpret=interpret,
        )(y0p, hxzp, epsp, *w_arrays, ys, qpar, zs, stash_p, stash_d,
          cot_ys_p, cot_res_p, cot_q_repack, cot_ppar_p)

        gy0 = outs[0][:bsz, :ny]
        ghxz = outs[1][:, :bsz, :nh_inf]
        it = iter(outs[2:])
        gqw, gqb = next(it), next(it)
        g_q = {"kernel": jnp.concatenate(
                   [gqw[:nh_inf, :nz], gqw[:nh_inf, nz_pad:nz_pad + nz]], 1),
               "bias": jnp.concatenate(
                   [gqb[0, :nz], gqb[0, nz_pad:nz_pad + nz]], 0)}
        g_pz = []
        for layer in pz_params:
            gw, gb = next(it), next(it)
            d_in, d_out = layer["kernel"].shape
            g_pz.append({"kernel": gw[:d_in, :d_out], "bias": gb[0, :d_out]})
        g_dyn = []
        for layer in dyn_params:
            gw, gb = next(it), next(it)
            d_in, d_out = layer["kernel"].shape
            g_dyn.append({"kernel": gw[:d_in, :d_out], "bias": gb[0, :d_out]})
        g_eps = jnp.zeros((K, bsz, nz), jnp.float32)
        return g_q, g_pz, g_dyn, gy0, ghxz, g_eps

    @jax.custom_vjp
    def rollout(q_params, pz_params, dyn_params, y_0, hxz, eps):
        return fwd_impl(q_params, pz_params, dyn_params, y_0, hxz, eps)[0]

    rollout.defvjp(fwd_impl, bwd_impl)
    return rollout
