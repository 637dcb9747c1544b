from srvp_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, batch_sharding, replicated, shard_batch,
    shard_stacked_batches, pad_to_multiple,
)
from srvp_tpu.parallel import multihost  # noqa: F401
