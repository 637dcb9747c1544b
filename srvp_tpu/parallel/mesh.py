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

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices=None, devices=None):
    """Builds a 1-D data-parallel mesh over the local devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        assert n_devices <= len(devices), (
            f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh, batch_axis=1, ndim=5):
    """NamedSharding for a video batch: shard `batch_axis`, replicate the rest."""
    spec = [None] * ndim
    spec[batch_axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(mesh, batch, batch_axis=1):
    """Places a host batch onto the mesh, sharded over the data axis.

    Dense video batches are (T, B, ...) with batch axis 1; parts dicts
    (device-side compositing) carry their batch on axis 0 of every leaf.
    Batches whose batch axis does not divide the mesh (e.g. a small
    validation batch) are placed replicated instead — correct, just not
    distributed."""
    n = mesh.devices.size
    if isinstance(batch, dict):
        return {
            k: jax.device_put(
                v,
                batch_sharding(mesh, 0, v.ndim) if v.shape[0] % n == 0
                else replicated(mesh))
            for k, v in batch.items()
        }
    if batch.shape[batch_axis] % n != 0:
        return jax.device_put(batch, replicated(mesh))
    return jax.device_put(batch, batch_sharding(mesh, batch_axis, batch.ndim))
