from srvp_tpu.models import layers, mlp, lstm, conv, srvp  # noqa: F401
