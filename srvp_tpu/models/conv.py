"""DCGAN64 / VGG64 frame encoders and decoders (NHWC, TPU layouts).

Architecture parity with /root/reference/module/conv.py:
  * DCGAN64Encoder  (conv.py:157-179): 4x (4x4 s2 conv + LeakyReLU(0.2), BN on
    all but the first) then a 4x4 valid conv -> BN -> tanh to a flat vector.
  * VGG64Encoder    (conv.py:182-224): 4 VGG stages of 3x3 convs (+BN+LeakyReLU)
    with 2x2 maxpools between, then maxpool + 4x4 valid conv -> BN -> tanh.
  * DCGAN64Decoder  (conv.py:278-305): mirror ConvTranspose stack; input
    channels doubled (coef=2) when skip connections are used; final plain
    ConvTranspose, sigmoid applied by the caller-facing apply.
  * VGG64Decoder    (conv.py:308-355): 4x4 ConvTranspose stem + nearest 2x
    upsampling VGG stages; final ConvTranspose(3,1,1).

Encoders return per-stage outputs as skip connections, deepest first
(conv.py:146-153); decoders concatenate skip i before stage i
(conv.py:266-271).

All convolutions are bias-free like the reference. Blocks keep the torch op
order conv -> BN -> activation; XLA fuses the BN+activation epilogue into the
conv on TPU, so no hand-written fusion is needed on this path.
"""

import jax
import jax.numpy as jnp

from srvp_tpu.models.layers import ConvBlockSpec, conv_block_apply, conv_block_init
from srvp_tpu.ops import convops

# An op inside a stage: ('block', ConvBlockSpec) | ('maxpool', None) | ('upsample', None)


def _b(kind, in_ch, out_ch, kernel, stride, padding, activation="leaky_relu", bn=True):
    return ("block", ConvBlockSpec(kind, in_ch, out_ch, kernel, stride, padding, activation, bn))


def encoder_spec(archi, nc, nh, nf):
    """Returns (stages, last) op lists for the requested architecture."""
    if archi == "dcgan":
        stages = [
            [_b("conv", nc, nf, 4, 2, 1, bn=False)],
            [_b("conv", nf, nf * 2, 4, 2, 1)],
            [_b("conv", nf * 2, nf * 4, 4, 2, 1)],
            [_b("conv", nf * 4, nf * 8, 4, 2, 1)],
        ]
        last = [_b("conv", nf * 8, nh, 4, 1, 0, activation="tanh")]
        return stages, last
    if archi == "vgg":
        stages = [
            [_b("conv", nc, nf, 3, 1, 1), _b("conv", nf, nf, 3, 1, 1)],
            [("maxpool", None), _b("conv", nf, nf * 2, 3, 1, 1), _b("conv", nf * 2, nf * 2, 3, 1, 1)],
            [("maxpool", None), _b("conv", nf * 2, nf * 4, 3, 1, 1),
             _b("conv", nf * 4, nf * 4, 3, 1, 1), _b("conv", nf * 4, nf * 4, 3, 1, 1)],
            [("maxpool", None), _b("conv", nf * 4, nf * 8, 3, 1, 1),
             _b("conv", nf * 8, nf * 8, 3, 1, 1), _b("conv", nf * 8, nf * 8, 3, 1, 1)],
        ]
        last = [("maxpool", None), _b("conv", nf * 8, nh, 4, 1, 0, activation="tanh")]
        return stages, last
    raise ValueError(f"No encoder named '{archi}'")


def decoder_spec(archi, nc, ny, nf, skip):
    """Returns (first, stages) op lists. `ny` is the flat input dim (w + y)."""
    coef = 2 if skip else 1
    if archi == "dcgan":
        first = [_b("convt", ny, nf * 8, 4, 1, 0)]
        stages = [
            [_b("convt", nf * 8 * coef, nf * 4, 4, 2, 1)],
            [_b("convt", nf * 4 * coef, nf * 2, 4, 2, 1)],
            [_b("convt", nf * 2 * coef, nf, 4, 2, 1)],
            [_b("convt", nf * coef, nc, 4, 2, 1, activation="none", bn=False)],
        ]
        return first, stages
    if archi == "vgg":
        first = [_b("convt", ny, nf * 8, 4, 1, 0), ("upsample", None)]
        stages = [
            [_b("conv", nf * 8 * coef, nf * 8, 3, 1, 1), _b("conv", nf * 8, nf * 8, 3, 1, 1),
             _b("conv", nf * 8, nf * 4, 3, 1, 1), ("upsample", None)],
            [_b("conv", nf * 4 * coef, nf * 4, 3, 1, 1), _b("conv", nf * 4, nf * 4, 3, 1, 1),
             _b("conv", nf * 4, nf * 2, 3, 1, 1), ("upsample", None)],
            [_b("conv", nf * 2 * coef, nf * 2, 3, 1, 1), _b("conv", nf * 2, nf, 3, 1, 1),
             ("upsample", None)],
            [_b("conv", nf * coef, nf, 3, 1, 1),
             _b("convt", nf, nc, 3, 1, 1, activation="none", bn=False)],
        ]
        return first, stages
    raise ValueError(f"No decoder named '{archi}'")


# ---------------------------------------------------------------------------
# init / apply over op lists
# ---------------------------------------------------------------------------

def _ops_init(key, ops):
    params, state = [], []
    keys = jax.random.split(key, max(len(ops), 1))
    for k, (op, spec) in zip(keys, ops):
        if op == "block":
            p, s = conv_block_init(k, spec, conv_init="normal", init_gain=0.02)
        else:
            p, s = {}, {}
        params.append(p)
        state.append(s)
    return params, state


def _ops_apply(params, state, ops, h, train):
    new_state = []
    for p, s, (op, spec) in zip(params, state, ops):
        if op == "block":
            h, ns = conv_block_apply(p, s, spec, h, train)
        elif op == "maxpool":
            h, ns = convops.max_pool2d(h), {}
        elif op == "upsample":
            h, ns = convops.upsample_nearest2x(h), {}
        else:
            raise ValueError(f"Unknown op '{op}'")
        new_state.append(ns)
    return h, new_state


def _stage_apply(params, state, ops, h, train, skip=None, nt=1):
    """One encoder/decoder stage.

    Remat notes (measured on the KTH vgg step, 100x20 frames): the step's
    temp memory sits at the HBM limit (14.4 GiB), but both full-stage
    `jax.checkpoint` (358 ms) and a save-only-conv-outputs policy (305 ms)
    measured SLOWER than letting XLA pick residuals itself (286 ms) — XLA
    already keeps roughly one tensor per conv block and its spill
    compression is cheaper than the recompute schedules. So stages run
    unwrapped; the checkpoint_name tags remain in conv_block_apply for
    future policy experiments.
    """
    if skip is None:
        return _ops_apply(params, state, ops, h, train)

    op0, spec0 = ops[0]
    assert op0 == "block", "skip-consuming stage must start with a conv"
    h, ns0 = conv_block_apply(params[0], state[0], spec0, h, train,
                              skip=skip, nt=nt)
    h, ns_rest = _ops_apply(params[1:], state[1:], ops[1:], h, train)
    return h, [ns0] + ns_rest


def encoder_init(key, stages, last):
    keys = jax.random.split(key, len(stages) + 1)
    params = {"stages": [], "last": None}
    state = {"stages": [], "last": None}
    for k, ops in zip(keys[:-1], stages):
        p, s = _ops_init(k, ops)
        params["stages"].append(p)
        state["stages"].append(s)
    params["last"], state["last"] = _ops_init(keys[-1], last)
    return params, state


def encoder_apply(params, state, stages, last, x, train):
    """x: (N, H, W, C) -> (h, skips, new_state).

    h: (N, nh); skips: per-stage outputs, deepest first.
    """
    skips = []
    h = x
    new_state = {"stages": [], "last": None}
    for p, s, ops in zip(params["stages"], state["stages"], stages):
        h, ns = _stage_apply(p, s, ops, h, train)
        skips.append(h)
        new_state["stages"].append(ns)
    h, new_state["last"] = _ops_apply(params["last"], state["last"], last, h, train)
    nh = h.shape[-1]
    return h.reshape(-1, nh), skips[::-1], new_state


def decoder_init(key, first, stages):
    keys = jax.random.split(key, len(stages) + 1)
    params = {"first": None, "stages": []}
    state = {"first": None, "stages": []}
    params["first"], state["first"] = _ops_init(keys[0], first)
    for k, ops in zip(keys[1:], stages):
        p, s = _ops_init(k, ops)
        params["stages"].append(p)
        state["stages"].append(s)
    return params, state


def decoder_apply(params, state, first, stages, z, skips, train, sigmoid=True,
                  nt=1):
    """z: (N, nz_flat); skips: None or list (deepest first) of (B, h, w, c)
    with N == nt * B — each skip is shared by the nt frames of its video and
    folded into the stage's first conv via the linear split in
    conv_block_apply (never materialized at (N, h, w, c))."""
    h = z.reshape(z.shape[0], 1, 1, z.shape[-1])
    new_state = {"first": None, "stages": []}
    h, new_state["first"] = _ops_apply(params["first"], state["first"], first, h, train)
    for i, (p, s, ops) in enumerate(zip(params["stages"], state["stages"], stages)):
        h, ns = _stage_apply(p, s, ops, h, train,
                             skip=None if skips is None else skips[i], nt=nt)
        new_state["stages"].append(ns)
    if sigmoid:
        h = jax.nn.sigmoid(h)
    return h, new_state
