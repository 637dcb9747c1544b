"""SRVP ELBO training objective.

Loss parity with /root/reference/train.py:91-106:
    loss = [ sum NLL(x_, x; obs_scale)
           + beta_y * sum KL(q(y_1) || N(0,1))
           + beta_z * sum KL(q(z) || p(z))
           + l2_res * sum ||res_t||_2 ] / batch_size

Sums run over all tensor elements; the division is by the GLOBAL batch size,
which under a sharded batch gives the same value as the reference's
per-process loss averaged by DDP.
"""

from typing import NamedTuple

import jax.numpy as jnp

from srvp_tpu.models import srvp
from srvp_tpu.ops import dists


class LossAux(NamedTuple):
    nll: jnp.ndarray
    kl_y_0: jnp.ndarray
    kl_z: jnp.ndarray
    l2_res: jnp.ndarray
    state: dict


def elbo_loss(cfg, params, state, x, rng, *, oversampling, obs_scale,
              beta_y, beta_z, l2_res, compute_dtype=jnp.float32,
              fused_rollout=False):
    """Returns (loss, LossAux). x: (T, B, H, W, C) float in [0, 1], uint8
    (normalized on device), or a Moving MNIST parts dict (digits +
    trajectories, composited on device — srvp_tpu/data/device_compose.py)."""
    from srvp_tpu.data.device_compose import materialize
    x = materialize(x, cfg.nx)
    nt, bsz = x.shape[0], x.shape[1]
    out = srvp.forward(cfg, params, state, x, nt, oversampling=oversampling,
                       rng=rng, train=True, compute_dtype=compute_dtype,
                       fused_rollout=fused_rollout)
    nll = dists.neg_logprob(out.x_, x, scale=obs_scale).sum()
    kl_y_0 = dists.kl_raw_vs_std_normal(out.q_y_0_params).sum()
    kl_z = dists.kl_raw_vs_raw(out.q_z_params, out.p_z_params).sum()
    loss = nll + beta_y * kl_y_0 + beta_z * kl_z
    l2 = jnp.zeros((), jnp.float32)
    if l2_res > 0:
        l2 = jnp.linalg.norm(out.res, axis=2).sum()
        loss = loss + l2_res * l2
    loss = loss / bsz
    return loss, LossAux(nll / bsz, kl_y_0 / bsz, kl_z / bsz, l2 / bsz, out.state)
