"""Parameter initializers reproducing PyTorch's defaults and the reference's overrides.

The reference initializes (see /root/reference/module/srvp.py:139-154 and
/root/reference/module/utils.py:51-85):
  * encoder/decoder conv + BN weights with normal(0, 0.02) / BN normal(1, 0.02)
  * the dynamics MLP with orthogonal(gain=res_gain)
  * everything else keeps PyTorch defaults:
      - Linear: kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in)),
        bias U(-1/sqrt(fan_in), 1/sqrt(fan_in))
      - LSTM: all weights and biases U(-1/sqrt(hidden), 1/sqrt(hidden))

Layout conventions here are JAX-native: linear kernels are (n_in, n_out),
conv kernels are HWIO. Initializer statistics are layout-invariant, so this
matches the torch distributions exactly.
"""

import math

import jax
import jax.numpy as jnp


def normal(key, shape, std=0.02, dtype=jnp.float32):
    """N(0, std) — reference encoder/decoder init."""
    return std * jax.random.normal(key, shape, dtype=dtype)


def bn_scale_normal(key, shape, std=0.02, dtype=jnp.float32):
    """N(1, std) — reference BatchNorm scale init."""
    return 1.0 + std * jax.random.normal(key, shape, dtype=dtype)


def uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch Linear/Conv default."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype=dtype, minval=-bound, maxval=bound)


def orthogonal(key, shape, gain=1.0, dtype=jnp.float32):
    """(Semi-)orthogonal init with gain, matching torch.nn.init.orthogonal_.

    `shape` is a 2D (n_in, n_out) kernel. Torch orthogonalizes the (n_out, n_in)
    matrix; the distributions coincide under transposition.
    """
    assert len(shape) == 2, "orthogonal init expects a 2D linear kernel"
    return jax.nn.initializers.orthogonal(scale=gain, column_axis=-1)(key, shape, dtype)


def xavier_normal(key, shape, gain=1.0, fan_in=None, fan_out=None, dtype=jnp.float32):
    """Xavier/Glorot normal with gain (capability parity with the reference's
    init_weight 'xavier' branch)."""
    if fan_in is None:
        fan_in = shape[0]
    if fan_out is None:
        fan_out = shape[-1]
    std = gain * math.sqrt(2.0 / (fan_in + fan_out))
    return std * jax.random.normal(key, shape, dtype=dtype)


def kaiming_normal(key, shape, fan_in=None, dtype=jnp.float32):
    """Kaiming normal, fan_in mode, a=0 (reference's 'kaiming' branch)."""
    if fan_in is None:
        fan_in = shape[0]
    std = math.sqrt(2.0 / fan_in)
    return std * jax.random.normal(key, shape, dtype=dtype)


def linear_default(key, n_in, n_out, bias=True, dtype=jnp.float32):
    """Torch nn.Linear default init; returns {'kernel': (n_in, n_out)[, 'bias']}."""
    k_w, k_b = jax.random.split(key)
    p = {"kernel": uniform_fan_in(k_w, (n_in, n_out), n_in, dtype)}
    if bias:
        p["bias"] = uniform_fan_in(k_b, (n_out,), n_in, dtype)
    return p


def lstm_default(key, n_in, n_hid, dtype=jnp.float32):
    """Torch nn.LSTM default init (single layer).

    Returns kernels in x @ W layout: w_ih (n_in, 4*n_hid), w_hh (n_hid, 4*n_hid),
    b_ih and b_hh (4*n_hid,). Gate order along the 4*n_hid axis is torch's
    (input, forget, cell, output).
    """
    keys = jax.random.split(key, 4)
    bound_shapes = [
        ("w_ih", (n_in, 4 * n_hid)),
        ("w_hh", (n_hid, 4 * n_hid)),
        ("b_ih", (4 * n_hid,)),
        ("b_hh", (4 * n_hid,)),
    ]
    return {
        name: uniform_fan_in(k, shape, n_hid, dtype)
        for k, (name, shape) in zip(keys, bound_shapes)
    }
