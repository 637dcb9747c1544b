"""Multi-process (multi-host) SPMD runtime.

The reference scales past one machine with torch.distributed DDP — one
process per GPU, NCCL rendezvous, explicit rank bookkeeping
(/root/reference/train.py:214-219,309-316). The TPU-native equivalent is
multi-controller SPMD: one Python process per HOST, each seeing only its
local chips, all enrolled in one global `jax.sharding.Mesh` via
`jax.distributed.initialize`. After initialization `jax.devices()` returns
the global device list, every process executes the same jitted GSPMD
program, and gradient reduction / SyncBN collectives ride ICI (and DCN
across slices) exactly as in the single-process case. The only genuinely
new concerns are:

  (a) each process must feed exactly its slice of the global batch
      (`local_batch_slice` + `shard_local_batch`), and
  (b) exactly one process writes checkpoints/logs (`is_primary`).

Data numerics are bit-identical to a single-process run: the loader's
per-item RNG depends only on (seed, epoch, position) — see
srvp_tpu/data/loader.py — so slicing each global batch by position leaves
every item's randomness unchanged for any process count.
"""

import logging

import numpy as np

import jax

logger = logging.getLogger(__name__)


def initialize_from_opt(opt):
    """Joins the multi-process runtime when requested; returns True iff the
    run is multi-process after the call.

    `--coordinator_address auto` relies on the TPU pod runtime's own
    metadata (every JAX TPU-VM host can discover its coordinator and
    process id); an explicit `host:port` requires `--num_processes` and
    `--process_id` the way a torch launcher passes ranks. Must run before
    anything touches the backend (jax.distributed.initialize cannot join an
    already-initialized client)."""
    addr = opt.get("coordinator_address")
    if not addr:
        return process_count() > 1
    if addr == "auto":
        jax.distributed.initialize()
    else:
        n, pid = opt.get("num_processes"), opt.get("process_id")
        if n is None or pid is None:
            raise ValueError(
                "--coordinator_address host:port requires --num_processes "
                "and --process_id (or pass 'auto' on a TPU pod, where the "
                "runtime provides them)")
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=n, process_id=pid)
    logger.info("multihost: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return process_count() > 1


def process_count():
    return jax.process_count()


def process_index():
    return jax.process_index()


def is_primary():
    """True on the process elected to write checkpoints, config and metrics
    (the multi-controller analogue of the reference's rank-0 guard)."""
    return jax.process_index() == 0


def broadcast_seed(seed):
    """Returns process 0's value of `seed` on every process.

    A randomly drawn seed (opt.seed is None) would otherwise differ per
    process, silently desynchronizing parameter init — every process must
    start from the same PRNGKey because parameters are replicated, not
    broadcast."""
    if process_count() == 1:
        return int(seed)
    from jax.experimental import multihost_utils
    return int(multihost_utils.broadcast_one_to_all(
        np.asarray(seed, dtype=np.int64)))


def sync(tag="sync"):
    """Global barrier (e.g. 'checkpoint written' before processes exit)."""
    if process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def local_batch_slice(mesh, global_batch_size):
    """(start, stop) rows of the global batch axis this process owns.

    The batch axis is sharded over every mesh axis (parallel/mesh.py
    `batch_sharding`), so global shard k lives on `mesh.devices.ravel()[k]`.
    jax.devices() orders the global list process-major, hence each
    process's rows are one contiguous run — asserted, not assumed, so an
    exotic device order fails loudly instead of feeding wrong data."""
    devs = mesh.devices.ravel()
    n = devs.size
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} does not divide the "
            f"{n}-device mesh; multi-process feeding has no replicated "
            f"fallback (every process must own a batch slice)")
    rows = global_batch_size // n
    mine = [k for k, d in enumerate(devs)
            if d.process_index == jax.process_index()]
    if not mine:
        raise ValueError("this process owns no devices in the mesh")
    if mine != list(range(mine[0], mine[0] + len(mine))):
        raise AssertionError(
            f"process {jax.process_index()}'s mesh positions {mine} are not "
            f"contiguous; the loader's contiguous batch slice would feed "
            f"wrong rows")
    return mine[0] * rows, (mine[-1] + 1) * rows


def validate_loader_slices(mesh, global_batch_size):
    """Raises unless the DataLoader's rank-based slice of the global batch
    (`shard_rank=process_index`, contiguous rows rank*per..(rank+1)*per) is
    exactly the rows this process's mesh devices own.

    `make_array_from_process_local_data` assembles the global array
    assuming the local data IS this process's slice in global row order —
    if the mesh's device order were not process-major by process index,
    every process would silently train on another process's data. This
    turns that assumption into a checked invariant at startup."""
    lo, hi = local_batch_slice(mesh, global_batch_size)
    per = hi - lo
    want = (jax.process_index() * per, (jax.process_index() + 1) * per)
    if (lo, hi) != want:
        raise AssertionError(
            f"mesh device order is not process-major by process index: "
            f"process {jax.process_index()} owns global batch rows "
            f"[{lo}, {hi}) but the loader feeds rows [{want[0]}, {want[1]}); "
            f"the sharded data stream would be misassigned")


def shard_local_batch(mesh, local_batch, batch_axis=1):
    """Builds the GLOBAL sharded batch array from this process's slice.

    Multi-process twin of `parallel.shard_batch`: there, one process holds
    the whole batch and `device_put` scatters it; here each process holds
    only `local_batch_slice` rows and `make_array_from_process_local_data`
    assembles the global `jax.Array` without any cross-host transfer.
    Dense video batches carry batch on `batch_axis`; parts dicts
    (device-side compositing) on axis 0 of every leaf."""
    from srvp_tpu.parallel.mesh import batch_sharding

    def put(v, ax):
        v = np.ascontiguousarray(v)
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, ax, v.ndim), v)

    if isinstance(local_batch, dict):
        return {k: put(v, 0) for k, v in local_batch.items()}
    return put(local_batch, batch_axis)


def shard_local_stacked(mesh, local_batches, batch_axis=1):
    """Multi-process twin of `parallel.shard_stacked_batches`: stacks k
    process-local batch slices on a new leading axis and assembles the
    global (k, ...) window for a steps-per-dispatch scan. The batch axis
    shifts right by the new leading k axis (dense: batch_axis+1; parts
    dict leaves: axis 1)."""
    from srvp_tpu.parallel.mesh import batch_sharding

    def put(v, ax):
        v = np.ascontiguousarray(v)
        return jax.make_array_from_process_local_data(
            batch_sharding(mesh, ax, v.ndim), v)

    first = local_batches[0]
    if isinstance(first, dict):
        return {k: put(np.stack([b[k] for b in local_batches]), 1)
                for k in first}
    return put(np.stack(local_batches), batch_axis + 1)
