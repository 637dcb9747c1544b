"""Gaussian distribution math used by SRVP, as pure JAX functions.

Behavioral parity targets (semantics, not code) in the reference:
  * raw-parameter split + softplus scale: /root/reference/module/utils.py:88-112
  * reparameterized sampling:             /root/reference/module/utils.py:115-134
  * fixed-scale Gaussian NLL:             /root/reference/module/utils.py:137-159
  * analytic Normal/Normal KL replaces torch.distributions.kl_divergence
    (/root/reference/train.py:95,98).

All functions operate on "raw params": a vector whose first half along `axis`
is the mean and second half is a raw scale, with
    scale = softplus(raw_scale) + eps,  eps = 1e-8
exactly as the reference. Computations are done in float32 regardless of the
compute dtype of the network to keep the ELBO numerically stable on TPU.
"""

import math

import jax
import jax.numpy as jnp

_EPS = 1e-8
_LOG_2PI = math.log(2.0 * math.pi)


def split_raw_params(raw_params, axis=-1):
    """Splits raw params into (loc, scale) with softplus(raw)+eps scale."""
    loc, raw_scale = jnp.split(raw_params, 2, axis=axis)
    scale = jax.nn.softplus(raw_scale) + _EPS
    return loc, scale


def rsample(raw_params, key, scale_stddev=1.0, axis=-1):
    """Reparameterized sample from the Gaussian encoded by `raw_params`."""
    loc, scale = split_raw_params(raw_params, axis=axis)
    noise = jax.random.normal(key, loc.shape, dtype=loc.dtype)
    return loc + noise * (scale * scale_stddev)


def neg_logprob(loc, data, scale=1.0):
    """Elementwise -log N(data | loc, scale) with a fixed scalar scale."""
    loc = loc.astype(jnp.float32)
    data = data.astype(jnp.float32)
    z = (data - loc) / scale
    return 0.5 * (z * z) + math.log(scale) + 0.5 * _LOG_2PI


def kl_normal(loc_q, scale_q, loc_p, scale_p):
    """Elementwise KL(N(loc_q, scale_q) || N(loc_p, scale_p))."""
    var_ratio = jnp.square(scale_q / scale_p)
    t1 = jnp.square((loc_q - loc_p) / scale_p)
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


def kl_raw_vs_std_normal(raw_params, axis=-1):
    """Elementwise KL between the raw-param Gaussian and N(0, 1)."""
    loc, scale = split_raw_params(raw_params.astype(jnp.float32), axis=axis)
    return kl_normal(loc, scale, 0.0, 1.0)


def kl_raw_vs_raw(raw_params_q, raw_params_p, axis=-1):
    """Elementwise KL between two raw-param Gaussians."""
    loc_q, scale_q = split_raw_params(raw_params_q.astype(jnp.float32), axis=axis)
    loc_p, scale_p = split_raw_params(raw_params_p.astype(jnp.float32), axis=axis)
    return kl_normal(loc_q, scale_q, loc_p, scale_p)
