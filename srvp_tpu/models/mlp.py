"""Pre-activation MLP.

Semantics parity with /root/reference/module/mlp.py:47-90: layer il applies
`activation` BEFORE its linear map for il > 0, no activation before the first
linear, and none after the last. Hidden width n_hid, output n_out.
"""

import jax

from srvp_tpu.models.layers import linear_apply
from srvp_tpu.ops import convops
from srvp_tpu.ops import init as winit


def mlp_dims(n_inp, n_hid, n_out, n_layers):
    assert n_hid == 0 or n_layers > 1
    return [
        (n_inp if il == 0 else n_hid, n_out if il == n_layers - 1 else n_hid)
        for il in range(n_layers)
    ]


def mlp_init(key, n_inp, n_hid, n_out, n_layers, init_type="default", init_gain=1.0):
    """Returns a list of linear param dicts.

    init_type='default' keeps torch Linear defaults (used by q_y, p_z in the
    reference); 'orthogonal' reproduces the reference's dynamics-MLP init
    (orthogonal kernels with gain, zero bias:
    /root/reference/module/srvp.py:152-154 + module/utils.py:75-80).
    """
    import jax.numpy as jnp
    dims = mlp_dims(n_inp, n_hid, n_out, n_layers)
    keys = jax.random.split(key, len(dims))
    params = []
    for k, (d_in, d_out) in zip(keys, dims):
        if init_type == "default":
            params.append(winit.linear_default(k, d_in, d_out))
        elif init_type == "orthogonal":
            params.append({
                "kernel": winit.orthogonal(k, (d_in, d_out), gain=init_gain),
                "bias": jnp.zeros((d_out,), jnp.float32),
            })
        else:
            raise ValueError(f"Unknown init_type '{init_type}'")
    return params


def mlp_apply(params, x, activation="relu"):
    act = convops.activation(activation)
    h = x
    for il, layer in enumerate(params):
        if il > 0:
            h = act(h)
        h = linear_apply(layer, h)
    return h
