"""Functional layer primitives: linear, batch norm, conv blocks.

Parameters are plain nested dicts of jnp arrays (pytrees); every apply is a
pure function. Mutable batch-norm statistics are threaded explicitly as a
`state` pytree, the TPU-idiomatic replacement for torch's module buffers.

Cross-replica synchronous batch norm (reference: SyncBatchNorm conversion at
/root/reference/train.py:277-283) is obtained *by construction* here: under
jit/pjit with the batch axis sharded over the `data` mesh axis, `jnp.mean`
over the batch is a global mean and XLA inserts the collectives — no NCCL
wrapper module needed.
"""

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

from srvp_tpu.ops import convops, init as winit

BN_EPS = 1e-5       # torch.nn.BatchNorm2d default
BN_MOMENTUM = 0.1   # torch.nn.BatchNorm2d default


# ---------------------------------------------------------------------------
# Linear
# ---------------------------------------------------------------------------

def linear_apply(params, x):
    y = x @ params["kernel"].astype(x.dtype)
    if "bias" in params:
        y = y + params["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# Batch normalization
# ---------------------------------------------------------------------------

def bn_init(key, num_features, scale_std=None):
    """Returns (params, state) for a BatchNorm over the channel (last) axis.

    scale_std=None keeps torch defaults (scale=1, bias=0); the reference's
    encoder/decoder init uses scale ~ N(1, 0.02)
    (/root/reference/module/utils.py:81-85).
    """
    if scale_std is None:
        scale = jnp.ones((num_features,), jnp.float32)
    else:
        scale = winit.bn_scale_normal(key, (num_features,), std=scale_std)
    params = {"scale": scale, "bias": jnp.zeros((num_features,), jnp.float32)}
    state = {
        "mean": jnp.zeros((num_features,), jnp.float32),
        "var": jnp.ones((num_features,), jnp.float32),
    }
    return params, state


def _bn_stats_fwd(x, reduce_axes):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=reduce_axes)
    var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
    return mean, var


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _bn_stats_affine_vjp(x, reduce_axes):
    """Batch mean/var with a hand-written backward: dx is the closed-form
    per-channel affine  x*a + b  with a = 2 g_var / n and
    b = (g_mean - 2 g_var mean) / n, evaluated in x.dtype after folding the
    f32 per-channel scalars.

    Why: autodiff of the f32-upcast stats materializes f32 cotangents of
    activation size (the `d mean(xf)` / `d mean(xf^2)` pieces), doubling the
    HBM traffic of the stats-backward under bf16 compute. This VJP is one
    elementwise pass in compute dtype. Mathematically identical to the
    autodiff formula (same reassociation class); under bf16 the per-channel
    scalar fold rounds once per channel instead of per element. Experiment
    flag: SRVP_BN_STATS=affine_vjp (perf A/B; default keeps autodiff).
    """
    return _bn_stats_fwd(x, reduce_axes)


def _bn_stats_affine_fwd(x, reduce_axes):
    mean, var = _bn_stats_fwd(x, reduce_axes)
    return (mean, var), (x, mean)


def _bn_stats_affine_bwd(reduce_axes, res, g):
    x, mean = res
    g_mean, g_var = g                      # f32, per-channel
    n = 1
    for ax in reduce_axes:
        n *= x.shape[ax]
    a = (2.0 / n) * g_var
    b = g_mean / n - a * mean
    dx = x * a.astype(x.dtype) + b.astype(x.dtype)
    return (dx,)


_bn_stats_affine_vjp.defvjp(_bn_stats_affine_fwd, _bn_stats_affine_bwd)


def bn_apply(params, state, x, train):
    """Batch norm over all axes but the last. Returns (y, new_state).

    Training normalizes with biased batch statistics and updates running
    stats with the unbiased variance (torch semantics). Statistics are
    computed in float32 even under bf16 compute.
    """
    reduce_axes = tuple(range(x.ndim - 1))
    if train:
        if os.environ.get("SRVP_BN_STATS") == "affine_vjp":
            mean, var = _bn_stats_affine_vjp(x, reduce_axes)
        else:
            mean, var = _bn_stats_fwd(x, reduce_axes)
        mean = checkpoint_name(mean, "bn_stats")
        var = checkpoint_name(var, "bn_stats")
        n = 1
        for ax in reduce_axes:
            n *= x.shape[ax]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "mean": (1 - BN_MOMENTUM) * state["mean"] + BN_MOMENTUM * mean,
            "var": (1 - BN_MOMENTUM) * state["var"] + BN_MOMENTUM * unbiased,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jnp.reciprocal(jnp.sqrt(var + BN_EPS))
    scale = (params["scale"] * inv).astype(x.dtype)
    shift = (params["bias"] - params["scale"] * mean * inv).astype(x.dtype)
    return x * scale + shift, new_state


# ---------------------------------------------------------------------------
# Conv blocks: conv/convT -> [BN] -> activation
# (reference structure: /root/reference/module/conv.py:81-107)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class ConvBlockSpec:
    """Static description of one conv block."""
    kind: str          # 'conv' | 'convt'
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    padding: int
    activation: str = "leaky_relu"
    bn: bool = True


def conv_block_init(key, spec, conv_init="normal", init_gain=0.02):
    """Returns (params, state) for a ConvBlockSpec.

    conv_init='normal' reproduces the reference encoder/decoder init
    (normal(0, 0.02) conv kernels, N(1, 0.02) BN scales); 'default' keeps
    torch module defaults.
    """
    import jax
    k_conv, k_bn = jax.random.split(key)
    shape = (spec.kernel, spec.kernel, spec.in_ch, spec.out_ch)
    if conv_init == "normal":
        kernel = winit.normal(k_conv, shape, std=init_gain)
        bn_scale_std = init_gain
    elif conv_init == "default":
        fan_in = spec.in_ch * spec.kernel * spec.kernel
        kernel = winit.uniform_fan_in(k_conv, shape, fan_in)
        bn_scale_std = None
    else:
        raise ValueError(f"Unknown conv_init '{conv_init}'")
    params = {"conv": {"kernel": kernel}}
    state = {}
    if spec.bn:
        params["bn"], state["bn"] = bn_init(k_bn, spec.out_ch, scale_std=bn_scale_std)
    return params, state


def conv_block_apply(params, state, spec, x, train, skip=None, nt=None):
    """Applies conv/convT -> [BN] -> activation. Returns (y, new_state).

    skip/nt implement the decoder's skip-connection concat WITHOUT
    materializing the time broadcast: the reference concatenates a
    time-replicated skip tensor to the input channels
    (/root/reference/module/conv.py:266-271). Since convolution is linear in
    the channel concat, conv([x ; tile(skip, nt)], W) ==
    conv(x, W[:, :, :cx]) + tile_t(conv(skip, W[:, :, cx:])), so the
    skip half is convolved ONCE per video instead of nt times. The tile-add
    itself runs as a one-hot matmul on the folded batch axis (see the
    SRVP_SKIP_ADD branch below): the earlier (bsz, nt, ...) reshape +
    broadcast formulation materialized the time-tiled tensor AND paid a
    relayout copy each way under XLA's batch-minor conv layout (round-4
    KTH profile: ~18 ms/step across the decoder skip sites).
    x: (nt*B, h, w, cx); skip: (B, h, w, cs).
    """
    W = params["conv"]["kernel"]
    if spec.kind == "conv":
        conv = convops.conv2d
    elif spec.kind == "convt":
        # convT kernels are stored pre-flipped (see convops)
        conv = convops.conv_transpose2d_preflipped
    else:
        raise ValueError(f"Unknown conv kind '{spec.kind}'")
    if skip is None:
        h = conv(x, W, spec.stride, spec.padding)
    else:
        cx = x.shape[-1]
        h = conv(x, W[:, :, :cx], spec.stride, spec.padding)
        hs = conv(skip.astype(x.dtype), W[:, :, cx:], spec.stride, spec.padding)
        bsz = skip.shape[0]
        if os.environ.get("SRVP_SKIP_ADD", "foldmm") == "foldmm":
            # Tile-add on the FOLDED batch axis via a one-hot matmul:
            # h[q] += T[q, q//nt] hs[q//nt]. Avoids the (bsz, nt, ...)
            # reshape of h, which under XLA's batch-minor conv layout is a
            # relayout copy each way plus a materialized
            # (bsz, nt, h, w, c) broadcast (measured ~18 ms/step across
            # the KTH decoder skip sites). One nonzero product per output
            # => bit-equal to the broadcast-add.
            tile = jax.nn.one_hot(jnp.arange(h.shape[0]) // nt, bsz)
            h = h + jnp.einsum("qb,b...->q...", tile.astype(h.dtype), hs)
        else:
            # h's folded batch is batch-major (b*nt + t), see srvp.encode;
            # the (bsz, nt) split keeps the sharded example dim the major
            # partner so GSPMD can partition this add.
            h = (h.reshape((bsz, nt) + h.shape[1:]) + hs[:, None]).reshape(h.shape)
    # Residual-policy tag: under the stage checkpoint (models/conv.py
    # _stage_apply) only conv outputs and BN stats are saved for backward;
    # BN-normalized/activated/pooled tensors are recomputed elementwise.
    h = checkpoint_name(h, "conv_out")
    new_state = {}
    if spec.bn:
        h, new_state["bn"] = bn_apply(params["bn"], state["bn"], h, train)
    return convops.activation(spec.activation)(h), new_state
