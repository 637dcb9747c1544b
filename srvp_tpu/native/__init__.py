from srvp_tpu.native.loader import get_native_lib, mmnist_generate_batch  # noqa: F401
