"""Pallas TPU kernel: fused prior-mode latent Euler rollout.

The generation hot loop (reference srvp.py:377-405, pure-prior mode used by
test.py:244) is a strictly sequential chain of tiny MLPs:

    p_par = p_z(y);  z = loc + eps_t * (softplus(raw) + 1e-8)
    y    += dt * dynamics(concat(y, z))

As a lax.scan this issues ~2*nlayers small matmuls per step from HBM-resident
weights. This kernel instead keeps ALL MLP weights pinned in VMEM for the
whole rollout and runs the (n_steps x nlayers) matmul chain on the MXU with
zero HBM weight re-reads — the classic "weights-stationary" TPU pattern.

Reparameterization noise eps is precomputed by the caller with the SAME
jax.random key schedule as srvp.generate, so fused and scan paths sample
identical trajectories.

Feature dims are zero-padded to lane multiples (128) on the host; padded
weight rows/columns are zero so they are inert through matmul + bias. The
softplus scale is masked so padded z lanes stay exactly zero (softplus(0) +
eps would leak otherwise). Batch is padded to sublane multiples (8).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUBLANE = 8


def _round_up(n, m):
    return -(-n // m) * m


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def pack_mlp(params):
    """Pads an MLP param list to lane-aligned f32 (W, b) pairs.

    Rows/cols are padded at the END, so an input laid out as the original
    features followed by zeros multiplies correctly.
    """
    packed = []
    for layer in params:
        w = layer["kernel"].astype(jnp.float32)
        b = layer["bias"].astype(jnp.float32)
        wp = _pad_to(_pad_to(w, _round_up(w.shape[0], LANE), 0),
                     _round_up(w.shape[1], LANE), 1)
        bp = _pad_to(b, _round_up(b.shape[0], LANE), 0)
        packed.append((wp, bp))
    return packed


def _repack_split_output(layer, nz, nz_pad):
    """Re-packs a (.., 2*nz) raw-param head so loc lands in [:nz_pad] and the
    raw scale in [nz_pad:2*nz_pad] of the padded output."""
    w, b = layer["kernel"].astype(jnp.float32), layer["bias"].astype(jnp.float32)
    in_pad = _round_up(w.shape[0], LANE)
    w_new = jnp.zeros((in_pad, 2 * nz_pad), jnp.float32)
    w_new = w_new.at[: w.shape[0], :nz].set(w[:, :nz])
    w_new = w_new.at[: w.shape[0], nz_pad:nz_pad + nz].set(w[:, nz:])
    b_new = jnp.zeros((2 * nz_pad,), jnp.float32)
    b_new = b_new.at[:nz].set(b[:nz])
    b_new = b_new.at[nz_pad:nz_pad + nz].set(b[nz:])
    return (w_new, b_new)


def _mlp_chain(refs, h):
    """Pre-activation ReLU MLP over VMEM weight refs (f32 MXU matmuls)."""
    for il, (w_ref, b_ref) in enumerate(refs):
        if il > 0:
            h = jnp.maximum(h, 0.0)
        h = jnp.dot(h, w_ref[:, :], preferred_element_type=jnp.float32) \
            + b_ref[:, :]
    return h


def _rollout_kernel(oversampling, dt, ny, nz, nz_pad, yz_pad,
                    n_pz, n_dyn, *refs):
    # grid = (batch_tiles, n_steps); step is the MINOR (sequential) dim.
    # refs: y0, eps_t, [pz w, b]*n_pz, [dyn w, b]*n_dyn, out_t, y_scr, z_scr
    y0_ref, eps_ref = refs[0], refs[1]
    pz_refs = [(refs[2 + 2 * i], refs[3 + 2 * i]) for i in range(n_pz)]
    off = 2 + 2 * n_pz
    dyn_refs = [(refs[off + 2 * i], refs[off + 1 + 2 * i]) for i in range(n_dyn)]
    out_ref = refs[off + 2 * n_dyn]
    y_scr = refs[off + 2 * n_dyn + 1]
    z_scr = refs[off + 2 * n_dyn + 2]

    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        # new batch tile: reset the carried state
        y_scr[:, :] = y0_ref[:, :]
        z_scr[:, :] = jnp.zeros_like(z_scr)

    bsz = y0_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bsz, nz_pad), 1)
    z_mask = (col < nz).astype(jnp.float32)

    y = y_scr[:, :]
    # a new z is drawn at the first substep of each integer frame and reused
    # for the remaining oversampling-1 substeps (srvp.py:379-396)
    p_par = _mlp_chain(pz_refs, y)                  # (B, 2*nz_pad)
    loc = p_par[:, :nz_pad]
    raw = p_par[:, nz_pad:]
    scale = (jax.nn.softplus(raw) + 1e-8) * z_mask
    z_new = loc * z_mask + eps_ref[0, :, :] * scale
    is_new = (t % oversampling) == 0
    z = jnp.where(is_new, z_new, z_scr[:, :])
    z_scr[:, :] = z
    # compact concat(y[:ny], z[:nz]) then zero-pad to the dyn input width
    yz = jnp.concatenate([y[:, :ny], z[:, :nz]], axis=1)
    yz = jnp.pad(yz, ((0, 0), (0, yz_pad - (ny + nz))))
    res = _mlp_chain(dyn_refs, yz)                  # (B, ny_pad)
    y_new = y + dt * res
    y_scr[:, :] = y_new
    out_ref[0, :, :] = y_new


def prior_rollout_fused(p_z_params, dyn_params, y_0, eps, ny, nz,
                        oversampling=1, interpret=False, batch_tile=512):
    """Fused prior rollout.

    y_0: (B, ny) f32; eps: (n_steps, B, nz) standard-normal draws, one per
    substep (only the first-substep-of-frame draws are consumed, matching the
    scan path's where-select). Returns the per-substep y sequence
    (n_steps, B, ny), excluding y_0.

    eps and the output stream through VMEM one (step, batch-tile) block at a
    time (Pallas double-buffers the grid pipeline); the MLP weights have a
    constant index map so they stay VMEM-resident across the whole grid.
    """
    n_steps, bsz = eps.shape[0], y_0.shape[0]
    dt = 1.0 / oversampling
    ny_pad = _round_up(ny, LANE)
    nz_pad = _round_up(nz, LANE)
    yz_pad = _round_up(ny + nz, LANE)
    # balanced batch tiles <= batch_tile (e.g. 1600 -> 4 x 400, not 4 x 512)
    b8 = _round_up(bsz, SUBLANE)
    n_bt = -(-b8 // batch_tile)
    b_tile = _round_up(-(-b8 // n_bt), SUBLANE)
    b_pad = n_bt * b_tile

    pz = pack_mlp(p_z_params)
    pz[-1] = _repack_split_output(p_z_params[-1], nz, nz_pad)
    dyn = pack_mlp(dyn_params)

    y0p = _pad_to(_pad_to(y_0.astype(jnp.float32), b_pad, 0), ny_pad, 1)
    epsp = _pad_to(_pad_to(eps.astype(jnp.float32), b_pad, 1), nz_pad, 2)

    weight_refs, weight_specs = [], []
    for w, b in pz + dyn:
        weight_refs.extend([w, b.reshape(1, -1)])
        weight_specs.extend([
            pl.BlockSpec(w.shape, lambda bt, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b.shape[0]), lambda bt, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ])

    kernel = partial(_rollout_kernel, oversampling, float(dt), ny, nz,
                     nz_pad, yz_pad, len(pz), len(dyn))
    out = pl.pallas_call(
        kernel,
        grid=(n_bt, n_steps),
        out_shape=jax.ShapeDtypeStruct((n_steps, b_pad, ny_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec((b_tile, ny_pad), lambda bt, t: (bt, 0),
                         memory_space=pltpu.VMEM),            # y0
            pl.BlockSpec((1, b_tile, nz_pad), lambda bt, t: (t, bt, 0),
                         memory_space=pltpu.VMEM),            # eps step block
        ] + weight_specs,
        out_specs=pl.BlockSpec((1, b_tile, ny_pad), lambda bt, t: (t, bt, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b_tile, ny_pad), jnp.float32),
                        pltpu.VMEM((b_tile, nz_pad), jnp.float32)],
        interpret=interpret,
    )(y0p, epsp, *weight_refs)
    return out[:, :bsz, :ny]
