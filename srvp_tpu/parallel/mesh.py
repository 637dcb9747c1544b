"""Device mesh and sharding helpers.

The reference scales with NCCL one-process-per-GPU data parallelism
(/root/reference/train.py:214-219,309-316). The TPU-native equivalent is
single-program SPMD: one `jax.sharding.Mesh` over the chips with the video
batch axis sharded along the `data` axis. Gradients are reduced by XLA's
GSPMD partitioner (collectives ride the ICI), and batch-norm statistics are
global automatically because `jnp.mean` over a sharded axis IS a
cross-replica mean — SyncBatchNorm semantics with zero extra code.

Videos are time-major (T, B, H, W, C); the batch axis is axis 1.
"""

import logging

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
DCN_AXIS = "dcn"

logger = logging.getLogger(__name__)
_warned_replicated = set()


def make_mesh(n_devices=None, devices=None, dcn=1):
    """Builds the data-parallel mesh over the local devices.

    `dcn=1` (default): a 1-D `(data,)` mesh — every chip on one ICI domain.
    `dcn>1`: a 2-D `(dcn, data)` mesh for multi-slice pods (SURVEY.md §2.4):
    the leading axis maps across slices (collectives ride the slower DCN
    links), the trailing axis within a slice (ICI). Parameters stay
    replicated over both axes; the batch is sharded over both (see
    `batch_sharding`), so gradient reduction becomes a hierarchical
    in-slice + cross-slice all-reduce — GSPMD emits that automatically from
    the mesh shape. Devices are assumed slice-major (jax.devices() orders by
    process/slice index first, which is the multi-slice runtime's layout).

    Raises a targeted error when more devices are requested than exist;
    callers that want an N-device mesh on a smaller host (e.g. the driver's
    multi-chip dry run) must provision virtual devices BEFORE jax
    initializes: `XLA_FLAGS=--xla_force_host_platform_device_count=N
    JAX_PLATFORMS=cpu` (see tests/conftest.py and
    __graft_entry__.dryrun_multichip)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} JAX device(s) exist. To emulate N devices "
                f"on one host, set XLA_FLAGS=--xla_force_host_platform_"
                f"device_count={n_devices} JAX_PLATFORMS=cpu before jax "
                f"initializes (the recipe used by tests/conftest.py and "
                f"__graft_entry__.dryrun_multichip).")
        devices = devices[:n_devices]
    devices = np.asarray(devices)
    if dcn > 1:
        if devices.size % dcn:
            raise ValueError(
                f"dcn={dcn} does not divide the {devices.size}-device mesh")
        return Mesh(devices.reshape(dcn, -1), (DCN_AXIS, DATA_AXIS))
    return Mesh(devices, (DATA_AXIS,))


def batch_sharding(mesh, batch_axis=1, ndim=5):
    """NamedSharding for a video batch: shard `batch_axis` over every mesh
    axis (data on a 1-D mesh, (dcn, data) jointly on a 2-D mesh), replicate
    the rest."""
    spec = [None] * ndim
    spec[batch_axis] = tuple(mesh.axis_names)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, batch_axis=1):
    """Places a host batch onto the mesh, sharded over the data axis.

    Dense video batches are (T, B, ...) with batch axis 1; parts dicts
    (device-side compositing) carry their batch on axis 0 of every leaf.
    Batches whose batch axis does not divide the mesh (e.g. a small
    validation batch) are placed replicated instead — correct, just not
    distributed. The fallback is logged once per (batch_size, mesh_size)
    pair so silent serialization is visible in training logs."""
    n = mesh.devices.size
    if isinstance(batch, dict):
        return {
            k: jax.device_put(
                v,
                batch_sharding(mesh, 0, v.ndim) if v.shape[0] % n == 0
                else _replicated_fallback(mesh, v.shape[0], n))
            for k, v in batch.items()
        }
    if batch.shape[batch_axis] % n != 0:
        return jax.device_put(
            batch, _replicated_fallback(mesh, batch.shape[batch_axis], n))
    return jax.device_put(batch, batch_sharding(mesh, batch_axis, batch.ndim))


def shard_stacked_batches(mesh, batches, batch_axis=1):
    """Stacks k host batches on a new leading axis and ships them in ONE
    device_put per leaf, sharded over the (now shifted) batch axis.

    Feed for a steps-per-dispatch window (`make_train_step(...,
    steps_per_call=k)`): leaves become (k, T, B, ...) for dense video
    batches (batch axis 1 -> 2) or (k, B, ...) for parts dicts (batch
    axis 0 -> 1); `lax.scan` consumes the leading axis. Same
    replicated-fallback contract as `shard_batch` for batch sizes that do
    not divide the mesh."""
    n = mesh.devices.size

    def put(v, ax):
        return jax.device_put(
            v,
            batch_sharding(mesh, ax, v.ndim) if v.shape[ax] % n == 0
            else _replicated_fallback(mesh, v.shape[ax], n))

    first = batches[0]
    if isinstance(first, dict):
        return {k: put(np.stack([b[k] for b in batches]), 1) for k in first}
    return put(np.stack(batches), batch_axis + 1)


def pad_to_multiple(batch, n, batch_axis=1):
    """Pads the batch axis up to a multiple of n by repeating the last
    element; returns (padded, n_valid).

    Lets ragged final val/test batches stay DISTRIBUTED over the mesh
    (instead of the `shard_batch` replicated fallback, which runs the whole
    batch on every device). Callers slice their per-example outputs back to
    `n_valid`. Dense video batches carry batch on `batch_axis`; parts dicts
    carry it on axis 0 of every leaf."""
    def pad_arr(v, ax):
        b = v.shape[ax]
        r = (-b) % n
        if r == 0:
            return v, b
        v = np.asarray(v)
        idx = [slice(None)] * v.ndim
        idx[ax] = slice(b - 1, b)
        return np.concatenate(
            [v, np.repeat(v[tuple(idx)], r, axis=ax)], axis=ax), b
    if isinstance(batch, dict):
        if not batch:
            raise ValueError("pad_to_multiple: empty parts dict")
        sizes = {k: v.shape[0] for k, v in batch.items()}
        if len(set(sizes.values())) != 1:
            raise ValueError(
                f"pad_to_multiple: parts dict leaves disagree on batch "
                f"size: {sizes}")
        out, n_valid = {}, None
        for k, v in batch.items():  # parts dicts: batch is axis 0 by contract
            out[k], n_valid = pad_arr(v, 0)
        return out, n_valid
    return pad_arr(batch, batch_axis)


def _replicated_fallback(mesh, batch_size, n):
    key = (batch_size, n)
    if key not in _warned_replicated:
        _warned_replicated.add(key)
        logger.warning(
            "shard_batch: batch size %d does not divide the %d-device mesh; "
            "placing this batch REPLICATED (runs on every device, no data "
            "parallel speedup). Pad or resize the batch to a multiple of %d "
            "to distribute it.", batch_size, n, n)
    return replicated(mesh)
