from srvp_tpu.native.loader import (  # noqa: F401
    get_native_lib, mmnist_generate_batch, mmnist_parts_batch,
)
