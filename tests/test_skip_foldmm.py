"""Equivalence of the folded-axis one-hot-matmul skip paths vs the mask /
broadcast formulations.

The production default (SRVP_SKIP_SELECT/SRVP_SKIP_ADD = "foldmm") selects
the per-video skip frame and tile-adds the decoder skip with one-hot matmuls
on the folded (bsz*nt) batch axis (models/srvp.py encode, layers.py
conv_block_apply) — the round-4 rewrite that removed the 5-D-reshape
relayout copies from the KTH step (docs/DESIGN.md "Round-4 skip-path
rewrite"). These tests lock the bit-level contract: at most one nonzero
product per output makes the matmul formulation exactly equal to the
mask+reduce / broadcast+add ones, for forward AND gradients, train and eval.

Reference behavior being preserved: /root/reference/module/srvp.py:181-192
(random skip frame), /root/reference/module/conv.py:266-271 (skip concat).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from srvp_tpu.models import srvp


CFGS = {
    "vgg": srvp.SRVPConfig(nx=64, nc=1, nf=4, nhx=16, ny=4, nz=4, skipco=True,
                           nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                           nlayers_res=2, archi="vgg"),
    "dcgan": srvp.SRVPConfig(nx=64, nc=1, nf=4, nhx=16, ny=4, nz=4,
                             skipco=True, nt_inf=2, nh_inf=8, nlayers_inf=2,
                             nh_res=16, nlayers_res=2, archi="dcgan"),
}


def _run(cfg, mode, monkeypatch, train):
    monkeypatch.setenv("SRVP_SKIP_SELECT", mode)
    monkeypatch.setenv("SRVP_SKIP_ADD", mode)
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (6, 3, 64, 64, 1))

    def loss_fn(p):
        out = srvp.forward(cfg, p, state, x, 6, rng=jax.random.PRNGKey(2),
                           train=train, oversampling=2)
        return jnp.sum(out.x_ ** 2), out.x_

    if train:
        (loss, x_), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return np.asarray(x_), jax.tree_util.tree_map(np.asarray, grads)
    out = srvp.forward(cfg, params, state, x, 6, rng=jax.random.PRNGKey(2),
                       train=False, oversampling=2)
    return np.asarray(out.x_), None


@pytest.mark.parametrize("archi", sorted(CFGS))
@pytest.mark.parametrize("train", [True, False])
def test_foldmm_matches_mask(archi, train, monkeypatch):
    cfg = CFGS[archi]
    x_mask, g_mask = _run(cfg, "mask", monkeypatch, train)
    x_mm, g_mm = _run(cfg, "foldmm", monkeypatch, train)
    # Forward is bit-equal: one nonzero product per output element.
    np.testing.assert_array_equal(x_mm, x_mask)
    if train:
        # Gradient of the tile-add sums nt terms through the matmul; the
        # accumulation order may differ from the 5-D reduce, so allow fp32
        # reassociation noise only (same tolerance class as the torch
        # grad-parity suite).
        flat_mask, tree = jax.tree_util.tree_flatten(g_mask)
        flat_mm, _ = jax.tree_util.tree_flatten(g_mm)
        for a, b in zip(flat_mask, flat_mm):
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=2e-4)
