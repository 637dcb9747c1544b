"""srvp_tpu — a TPU-native JAX framework for Stochastic Latent Residual Video Prediction.

A from-scratch re-design of the capabilities of edouardelasalles/srvp (ICML 2020,
arXiv:2002.09219) for TPU hardware: functional parameter pytrees, jit/pjit-compiled
train and rollout steps, `lax.scan` latent dynamics, SPMD data parallelism over a
`jax.sharding.Mesh` (cross-replica-synchronous batch norm for free under GSPMD), and
Pallas kernels for the hot latent-rollout op.

Layout conventions (TPU-first, unlike the reference's NCHW):
  * videos are time-major, channels-last: (T, B, H, W, C)
  * conv kernels are HWIO, linear kernels are (n_in, n_out)
  * the batch axis (axis 1 of videos) is the `data` mesh axis for SPMD
"""

__version__ = "0.1.0"

from srvp_tpu.helper import DotDict, load_json, load_yaml  # noqa: F401
