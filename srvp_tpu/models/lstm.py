"""Single-layer LSTM as a `lax.scan`, with torch nn.LSTM gate math.

The reference uses nn.LSTM(nhx, nh_inf, 1) for z-inference
(/root/reference/module/srvp.py:132). Torch gate order along the stacked
(4*hidden) axis is (input, forget, cell, output); both b_ih and b_hh are kept
so converted torch checkpoints load without bias folding.
"""

import jax
import jax.numpy as jnp
from jax import lax

from srvp_tpu.ops import init as winit


def lstm_init(key, n_in, n_hid):
    return winit.lstm_default(key, n_in, n_hid)


def lstm_apply(params, x):
    """Runs the LSTM over a time-major sequence.

    x: (T, B, n_in). Returns hidden states (T, B, n_hid); initial h/c are zero
    (torch default).
    """
    n_hid = params["w_hh"].shape[0]
    bsz = x.shape[1]
    dtype = x.dtype
    w_ih = params["w_ih"].astype(dtype)
    w_hh = params["w_hh"].astype(dtype)
    bias = (params["b_ih"] + params["b_hh"]).astype(dtype)

    # Hoist the input projection out of the scan: one big (T*B, n_in) matmul
    # on the MXU instead of T small ones.
    x_proj = x.reshape(-1, x.shape[-1]) @ w_ih + bias
    x_proj = x_proj.reshape(x.shape[0], bsz, 4 * n_hid)

    def cell(carry, xp_t):
        h, c = carry
        gates = xp_t + h @ w_hh
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    h0 = jnp.zeros((bsz, n_hid), dtype)
    c0 = jnp.zeros((bsz, n_hid), dtype)
    _, hs = lax.scan(cell, (h0, c0), x_proj, unroll=2)
    return hs
