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
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
