"""Mesh/sharding contract tests: oversized-mesh error, replication fallback
logging, and the driver-facing multichip dry run entry.

Reference capability being covered: multi-device NCCL DDP
(/root/reference/train.py:214-219,309-316).
"""

import logging

import numpy as np
import pytest

import jax

from srvp_tpu.parallel import make_mesh, shard_batch
from srvp_tpu.parallel import mesh as mesh_mod


def test_make_mesh_oversized_raises_targeted_error():
    n = len(jax.devices())
    with pytest.raises(ValueError, match="xla_force_host_platform"):
        make_mesh(n + 1)


def test_shard_batch_divisible_is_sharded():
    mesh = make_mesh(8)
    x = np.zeros((4, 16, 8, 8, 1), np.float32)
    xs = shard_batch(mesh, x)
    # batch axis 1 split over the 8 devices
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(4, 2, 8, 8, 1)}


def test_shard_batch_nondivisible_replicates_and_warns(caplog):
    mesh = make_mesh(8)
    mesh_mod._warned_replicated.clear()
    x = np.zeros((4, 3, 8, 8, 1), np.float32)  # 3 does not divide 8
    with caplog.at_level(logging.WARNING, logger="srvp_tpu.parallel.mesh"):
        xs = shard_batch(mesh, x)
    # every device holds the full batch
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(4, 3, 8, 8, 1)}
    assert any("REPLICATED" in r.message for r in caplog.records)
    # the warning is rate-limited: second call with the same shape is silent
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="srvp_tpu.parallel.mesh"):
        shard_batch(mesh, x)
    assert not caplog.records


def test_shard_batch_dict_nondivisible_replicates(caplog):
    mesh = make_mesh(8)
    mesh_mod._warned_replicated.clear()
    batch = {"digits": np.zeros((5, 2, 28, 28), np.uint8)}
    with caplog.at_level(logging.WARNING, logger="srvp_tpu.parallel.mesh"):
        out = shard_batch(mesh, batch)
    shard_shapes = {s.data.shape for s in out["digits"].addressable_shards}
    assert shard_shapes == {(5, 2, 28, 28)}
    assert any("REPLICATED" in r.message for r in caplog.records)


def test_dryrun_multichip_runs_in_process():
    # conftest provisions 8 virtual devices, so the in-process path runs.
    # Covers both the 1-D mesh and the (2, 4) (dcn, data) mesh legs.
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)


def test_make_mesh_2d_dcn():
    mesh = make_mesh(8, dcn=2)
    assert mesh.axis_names == ("dcn", "data")
    assert mesh.devices.shape == (2, 4)
    x = np.zeros((4, 16, 8, 8, 1), np.float32)
    xs = shard_batch(mesh, x)
    # batch axis split over all 8 devices (both mesh axes jointly)
    shard_shapes = {s.data.shape for s in xs.addressable_shards}
    assert shard_shapes == {(4, 2, 8, 8, 1)}


def test_make_mesh_dcn_indivisible_raises():
    with pytest.raises(ValueError, match="dcn=3"):
        make_mesh(8, dcn=3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_2d_mesh_training_matches_single_device():
    """(dcn, data) 2-D mesh training must reproduce 1-device numerics, same
    contract as the 1-D mesh test (tests/test_train.py)."""
    from srvp_tpu import train_lib
    from srvp_tpu.parallel import replicated
    from tests.test_train import TINY, HP, synth_batch

    x = synth_batch(nt=3, bsz=8, seed=2)

    def run(mesh):
        ts = train_lib.init_train_state(jax.random.PRNGKey(0), TINY, HP)
        ts = jax.device_put(ts, replicated(mesh))
        step = train_lib.make_train_step(TINY, HP)
        losses = []
        xs = shard_batch(mesh, x)
        for _ in range(3):
            ts, m = step(ts, xs)
            losses.append(float(m["loss"]))
        return losses

    losses_1 = run(make_mesh(1))
    losses_2d = run(make_mesh(8, dcn=2))
    np.testing.assert_allclose(losses_1, losses_2d, rtol=2e-4)


def test_pad_to_multiple_dense_and_dict():
    from srvp_tpu.parallel import pad_to_multiple
    x = np.arange(3 * 5 * 2, dtype=np.float32).reshape(3, 5, 2)
    xp, nv = pad_to_multiple(x, 8, batch_axis=1)
    assert nv == 5 and xp.shape == (3, 8, 2)
    np.testing.assert_array_equal(xp[:, :5], x)
    np.testing.assert_array_equal(xp[:, 5:], np.repeat(x[:, 4:5], 3, axis=1))
    # already divisible: untouched
    xs, nv2 = pad_to_multiple(x, 5, batch_axis=1)
    assert nv2 == 5 and xs is x
    # parts dict: batch on axis 0 of every leaf
    d = {"a": np.ones((6, 2)), "b": np.zeros((6, 3, 3))}
    dp, nv3 = pad_to_multiple(d, 4, batch_axis=1)
    assert nv3 == 6 and dp["a"].shape == (8, 2) and dp["b"].shape == (8, 3, 3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_evaluate_pads_ragged_batch_and_ignores_tail():
    """A 5-video val batch on an 8-device mesh must shard (not replicate)
    and produce the same metric as the unpadded single-device run."""
    from srvp_tpu import train_lib

    mesh = make_mesh(8)
    batches = [np.random.RandomState(0).rand(4, 5, 8).astype(np.float32)]
    seen_shapes = []

    def fake_eval(params, bn_state, x, key):
        seen_shapes.append(x.shape)
        # per-video metric = mean over frames/features (axis 1 = videos)
        import jax.numpy as jnp
        return jnp.asarray(x).mean(axis=(0, 2))

    ref = -float(np.mean(batches[0].mean(axis=(0, 2))))
    got = train_lib.evaluate(
        fake_eval, None, None, iter(batches), 1, jax.random.PRNGKey(0),
        shard_fn=lambda b: shard_batch(mesh, b), pad_to=mesh.devices.size)
    assert seen_shapes == [(4, 8, 8)]  # padded to the mesh multiple
    np.testing.assert_allclose(got, ref, rtol=1e-6)
