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


def _collective_counts(hlo):
    """Collective OP DEFINITIONS with their shapes (plain substring counts
    also pick up op_name metadata mentions, which differ meaninglessly)."""
    import collections
    import re
    ops = re.findall(
        r"= (\S+) ((?:all-gather|all-reduce|collective-permute|all-to-all|"
        r"reduce-scatter)[\w-]*)\(", hlo)
    return collections.Counter((op, shape) for shape, op in ops)


def test_foldmm_adds_no_collectives(monkeypatch):
    """SPMD contract for the folded-axis one-hot matmuls: contracting over
    the full folded batch axis must NOT make GSPMD gather the sharded
    activations — the partitioned train step's collective inventory is
    identical to the mask/broadcast formulation's (docs/DESIGN.md
    "Round-4 skip-path rewrite", SPMD check)."""
    import numpy as np
    from srvp_tpu import train_lib
    from srvp_tpu.parallel import make_mesh, replicated, shard_batch

    cfg = CFGS["vgg"]
    hp = train_lib.TrainHParams(oversampling=2, nt_cond=2)
    x = jnp.asarray(np.random.RandomState(0).rand(4, 8, 64, 64, 1)
                    .astype(np.float32))
    mesh = make_mesh(8)

    def lower(mode):
        monkeypatch.setenv("SRVP_SKIP_SELECT", mode)
        monkeypatch.setenv("SRVP_SKIP_ADD", mode)
        ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
        ts = jax.device_put(ts, replicated(mesh))
        step = train_lib.make_train_step(cfg, hp)
        return step.lower(ts, shard_batch(mesh, x)).compile().as_text()

    counts_mm = _collective_counts(lower("foldmm"))
    counts_mask = _collective_counts(lower("mask"))
    assert counts_mm == counts_mask, (counts_mm, counts_mask)

    # ... and none of them is activation-sized: the encoder hx tensors at
    # this config are bsz*nt*16*16*nf = 8192+ elements; the only expected
    # collectives are tiny hx/latent-sized gathers.
    import re
    for op, shape in counts_mm:
        dims = re.search(r"\[([\d,]*)\]", shape)
        n = np.prod([int(d) for d in dims.group(1).split(",") if d]) \
            if dims and dims.group(1) else 1
        assert n < 8192, f"activation-sized collective {op} {shape}"
