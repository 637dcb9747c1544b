from srvp_tpu.native.loader import (  # noqa: F401
    decode_png_batch, decode_png_timemajor, get_native_lib,
    mmnist_generate_batch, mmnist_parts_batch,
)
