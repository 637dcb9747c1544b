from srvp_tpu.ops import dists, init, convops  # noqa: F401
