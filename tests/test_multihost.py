"""Multi-process (multi-host) SPMD training.

The reference covers multi-machine scale with torch.distributed DDP
(/root/reference/train.py:214-219,309-316). The TPU-native design is
multi-controller SPMD (srvp_tpu/parallel/multihost.py): these tests cover

  * the loader's process-sharded batch slices (bit-identical concatenation
    to the unsharded stream — per-item seeds depend only on global
    position),
  * the mesh row-slice math and its error paths, and
  * a REAL 2-process run (gloo CPU collectives, 2 virtual devices per
    process -> one global 4-device mesh) through the actual train.py CLI
    surface, matched against the single-process 4-device run of the same
    config.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

from srvp_tpu.data.loader import DataLoader, PartsView
from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dataset():
    return MovingMNIST(synthetic_digits(6, np.random.RandomState(0)),
                       64, 6, 4, False, 2, True)


# ---------------------------------------------------------------------------
# Loader sharding
# ---------------------------------------------------------------------------

def test_sharded_loader_concatenates_to_unsharded_dense():
    """Process slices of every batch concatenate bit-exactly to the
    unsharded batch, across an epoch boundary (dense uint8 path)."""
    from srvp_tpu.data.base import collate_uint8
    ds = _dataset()
    full = DataLoader(ds, 8, seed=7, num_workers=1, collate_fn=collate_uint8)
    shards = [DataLoader(ds, 8, seed=7, num_workers=1,
                         collate_fn=collate_uint8,
                         shard_rank=r, shard_count=2) for r in range(2)]
    for _ in range(2):  # two epochs: epoch-order reshuffle must stay aligned
        got = [iter(s) for s in shards]
        for ref in full:
            parts = [next(g) for g in got]
            assert parts[0].shape[1] == ref.shape[1] // 2
            np.testing.assert_array_equal(
                np.concatenate(parts, axis=1), ref)
        for g in got:
            assert next(g, None) is None  # same batch count per epoch


def test_sharded_loader_concatenates_to_unsharded_parts():
    """Same bit-exactness for the parts-dict path (on-device compositing):
    parts leaves carry batch on axis 0."""
    from srvp_tpu.data.device_compose import parts_collate
    ds = PartsView(_dataset())
    full = DataLoader(ds, 8, seed=3, num_workers=1, collate_fn=parts_collate)
    shards = [DataLoader(ds, 8, seed=3, num_workers=1,
                         collate_fn=parts_collate,
                         shard_rank=r, shard_count=2) for r in range(2)]
    got = [iter(s) for s in shards]
    for ref in full:
        parts = [next(g) for g in got]
        assert set(parts[0]) == set(ref)
        for k in ref:
            np.testing.assert_array_equal(
                np.concatenate([p[k] for p in parts], axis=0), ref[k])


def test_sharded_loader_fast_forward_alignment():
    """Resume (fast_forward) advances every shard identically."""
    from srvp_tpu.data.base import collate_uint8
    ds = _dataset()

    def batches_after_ff(rank):
        dl = DataLoader(ds, 8, seed=9, num_workers=1,
                        collate_fn=collate_uint8,
                        shard_rank=rank, shard_count=2)
        dl.fast_forward(3)
        return next(iter(dl))

    full = DataLoader(ds, 8, seed=9, num_workers=1, collate_fn=collate_uint8)
    full.fast_forward(3)
    ref = next(iter(full))
    np.testing.assert_array_equal(
        np.concatenate([batches_after_ff(0), batches_after_ff(1)], axis=1),
        ref)


def test_sharded_loader_rejects_bad_configs():
    from srvp_tpu.data.base import collate_uint8
    ds = _dataset()
    with pytest.raises(ValueError, match="divide evenly"):
        DataLoader(ds, 9, shard_rank=0, shard_count=2,
                   collate_fn=collate_uint8)
    with pytest.raises(ValueError, match="drop_last"):
        DataLoader(ds, 8, drop_last=False, shard_rank=0, shard_count=2,
                   collate_fn=collate_uint8)
    with pytest.raises(ValueError, match="out of range"):
        DataLoader(ds, 8, shard_rank=2, shard_count=2,
                   collate_fn=collate_uint8)


# ---------------------------------------------------------------------------
# Mesh slice math
# ---------------------------------------------------------------------------

def test_local_batch_slice_single_process():
    """Single process owns every device -> the slice is the whole batch."""
    from srvp_tpu.parallel import make_mesh
    from srvp_tpu.parallel.multihost import local_batch_slice
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    assert local_batch_slice(mesh, 16) == (0, 16)
    with pytest.raises(ValueError, match="does not divide"):
        local_batch_slice(mesh, 12)


def test_validate_loader_slices_single_process():
    """Single process: the loader's rank-0 whole-batch slice IS the owned
    rows, so validation passes; indivisible batches still raise."""
    from srvp_tpu.parallel import make_mesh
    from srvp_tpu.parallel.multihost import validate_loader_slices
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    validate_loader_slices(mesh, 16)  # must not raise
    with pytest.raises(ValueError, match="does not divide"):
        validate_loader_slices(mesh, 12)


def test_shard_local_batch_single_process_matches_shard_batch():
    """With one process, shard_local_batch and shard_batch build the same
    global array (same sharding, same contents)."""
    from srvp_tpu.parallel import make_mesh, shard_batch
    from srvp_tpu.parallel.multihost import (shard_local_batch,
                                             shard_local_stacked)
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8)
    x = np.random.RandomState(0).rand(3, 16, 4, 4, 1).astype(np.float32)
    a = shard_batch(mesh, x)
    b = shard_local_batch(mesh, x)
    assert a.sharding.is_equivalent_to(b.sharding, a.ndim)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Stacked window: leading k axis shifts the batch axis right by one.
    from srvp_tpu.parallel import shard_stacked_batches
    xs = [np.random.RandomState(i).rand(3, 16, 4, 4, 1).astype(np.float32)
          for i in range(2)]
    aw = shard_stacked_batches(mesh, xs)
    bw = shard_local_stacked(mesh, xs)
    assert aw.sharding.is_equivalent_to(bw.sharding, aw.ndim)
    np.testing.assert_array_equal(np.asarray(aw), np.asarray(bw))

    # Parts dict: batch on axis 0 of each leaf.
    parts = {"p": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    ap = shard_batch(mesh, parts)["p"]
    bp = shard_local_batch(mesh, parts)["p"]
    assert ap.sharding.is_equivalent_to(bp.sharding, ap.ndim)
    np.testing.assert_array_equal(np.asarray(ap), np.asarray(bp))


# ---------------------------------------------------------------------------
# Real 2-process run through the CLI
# ---------------------------------------------------------------------------

_CHILD = r"""
import os, sys
port, pid, save, data = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from srvp_tpu import args as args_mod
from srvp_tpu.helper import DotDict
from srvp_tpu.train_main import main as train_main
argv = (
    f"--save_path {{save}} --dataset smmnist --data_dir {{data}} "
    "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 --seed 3 "
    "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
    "--nlayers_res 2 --batch_size 8 --batch_size_test 8 --n_iter 6 "
    "--val_interval 3 --n_iter_test 1 --n_samples_test 2 "
    "--val_samples_chunk 2 --log_interval 3 --allow_synthetic "
    "--n_workers 1 --seq_len_test 6 "
    f"--coordinator_address localhost:{{port}} --num_processes 2 "
    f"--process_id {{pid}}"
).format(save=save, data=data, port=port, pid=pid).split()
opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
rc = train_main(opt)
sys.exit(rc)
"""


def _run_single_process_reference(tmp_path):
    """The same config on a single-process 4-device mesh, in this pytest
    process (8 virtual devices exist; --n_devices 4 matches the global
    mesh the 2x2-process run builds)."""
    from srvp_tpu import args as args_mod
    from srvp_tpu.helper import DotDict
    from srvp_tpu.train_main import main as train_main
    xp = tmp_path / "xp_single"
    argv = (f"--save_path {xp} --dataset smmnist --data_dir {tmp_path} "
            "--ny 4 --nz 4 --nt_cond 3 --nt_inf 2 --nc 1 --seq_len 6 "
            "--seed 3 --nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
            "--nlayers_res 2 --batch_size 8 --batch_size_test 8 --n_iter 6 "
            "--val_interval 3 --n_iter_test 1 --n_samples_test 2 "
            "--val_samples_chunk 2 --log_interval 3 --allow_synthetic "
            "--n_workers 1 --seq_len_test 6 --n_devices 4").split()
    opt = DotDict(vars(args_mod.create_args().parse_args(argv)))
    assert train_main(opt) == 0
    return xp


@pytest.mark.slow
def test_two_process_run_matches_single_process(tmp_path):
    """Two processes (2 virtual CPU devices each, gloo collectives) train
    the flagship tiny config through the real CLI on a global 4-device
    mesh; the primary's artifacts must match a single-process 4-device run
    of the identical config: same GSPMD program, same global data (the
    loader slices are bit-identical), so losses and final weights agree to
    reduction-order tolerance."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import socket
    with socket.socket() as s:  # pick a free rendezvous port
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    xp_mh = tmp_path / "xp_mh"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    child = _CHILD.format(repo=REPO)
    procs = [subprocess.Popen(
        [sys.executable, "-c", child, str(port), str(pid), str(xp_mh),
         str(tmp_path)],
        env=env, cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True) for pid in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"

    # Only the primary writes the experiment directory.
    assert (xp_mh / "model.npz").exists()
    assert (xp_mh / "metrics.jsonl").exists()

    xp_single = _run_single_process_reference(tmp_path)

    # Same loss trajectory (logged at the same steps)...
    def losses(xp):
        recs = [json.loads(l) for l in
                (xp / "metrics.jsonl").read_text().splitlines()]
        return {r["step"]: r["loss"] for r in recs if "loss" in r}

    lm, ls = losses(xp_mh), losses(xp_single)
    assert set(lm) == set(ls) and lm
    for step in lm:
        np.testing.assert_allclose(lm[step], ls[step], rtol=1e-4,
                                   err_msg=f"loss diverged at step {step}")

    # ...and matching final weights (gloo vs XLA single-process reduction
    # order may differ in the last float bits).
    wm = np.load(xp_mh / "model.npz")
    ws = np.load(xp_single / "model.npz")
    assert set(wm.files) == set(ws.files)
    for k in wm.files:
        np.testing.assert_allclose(wm[k], ws[k], rtol=1e-4, atol=1e-6,
                                   err_msg=f"weight {k} diverged")
