"""Convert reference PyTorch SRVP checkpoints (.pt state_dicts) to srvp_tpu pytrees.

Layout conversions (SURVEY.md §5 checkpoint interop):
  * Conv2d weight OIHW -> HWIO (transpose 2,3,1,0)
  * ConvTranspose2d weight (Cin, Cout, kh, kw) -> (kh, kw, Cin, Cout)
  * Linear weight (out, in) -> kernel (in, out)
  * LSTM weight_ih/hh (4h, in) -> (in, 4h); torch gate order (i, f, g, o) is
    kept as-is by srvp_tpu.models.lstm
  * BatchNorm weight/bias -> params scale/bias; running_mean/var -> state

Key-structure notes (reference module container layout):
  * make_conv_block -> Sequential(conv[, BN][, act]); conv at idx 0, BN at 1
    (/root/reference/module/conv.py:81-107)
  * the final decoder layers are RAW ConvTranspose2d modules, not blocks
    (/root/reference/module/conv.py:304,353) — in srvp_tpu these are blocks
    with bn=False, activation='none'
  * MLP -> Sequential of Sequential([act,] Linear): layer 0 keys end with
    .0.0.*, later layers with .{il}.1.* (/root/reference/module/mlp.py:40-74)
  * w_proj / w_inf are Sequential(Linear, act) -> keys .0.*
    (/root/reference/module/srvp.py:127-128)
"""

import numpy as np


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _conv_w(sd, key):
    return _np(sd[key]).transpose(2, 3, 1, 0)


def _convt_w(sd, key):
    # (Cin, Cout, kh, kw) -> pre-flipped HWIO (the model stores convT kernels
    # spatially flipped so apply-time needs no flip; see ops/convops.py)
    return _np(sd[key]).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _linear(sd, prefix):
    return {"kernel": _np(sd[f"{prefix}.weight"]).T, "bias": _np(sd[f"{prefix}.bias"])}


def _bn(sd, prefix):
    params = {"scale": _np(sd[f"{prefix}.weight"]), "bias": _np(sd[f"{prefix}.bias"])}
    state = {"mean": _np(sd[f"{prefix}.running_mean"]),
             "var": _np(sd[f"{prefix}.running_var"])}
    return params, state


def _block(sd, prefix, spec, raw=False):
    """Converts one conv block. `raw` = the torch module is a bare conv layer."""
    conv_key = f"{prefix}.weight" if raw else f"{prefix}.0.weight"
    w = _convt_w(sd, conv_key) if spec.kind == "convt" else _conv_w(sd, conv_key)
    params = {"conv": {"kernel": w}}
    state = {}
    if spec.bn:
        params["bn"], state["bn"] = _bn(sd, f"{prefix}.1")
    return params, state


def _is_raw(spec):
    return (not spec.bn) and spec.activation == "none"


def _ops(sd, prefix_fn, ops):
    """Converts a list of (op, spec) items; prefix_fn(j) gives the torch prefix."""
    params, state = [], []
    for j, (op, spec) in enumerate(ops):
        if op == "block":
            p, s = _block(sd, prefix_fn(j), spec, raw=_is_raw(spec))
        else:  # maxpool / upsample: stateless, but occupies a torch index
            p, s = {}, {}
        params.append(p)
        state.append(s)
    return params, state


def _encoder(sd, cfg):
    stages, last = cfg.encoder_spec()
    params = {"stages": [], "last": None}
    state = {"stages": [], "last": None}
    for i, ops in enumerate(stages):
        if cfg.archi == "dcgan":
            # ModuleList of blocks: encoder.conv.{i} IS the block
            assert len(ops) == 1
            prefix_fn = lambda j, i=i: f"encoder.conv.{i}"
        else:
            # ModuleList of Sequentials: encoder.conv.{i}.{j}
            prefix_fn = lambda j, i=i: f"encoder.conv.{i}.{j}"
        p, s = _ops(sd, prefix_fn, ops)
        params["stages"].append(p)
        state["stages"].append(s)
    if cfg.archi == "dcgan":
        last_fn = lambda j: "encoder.last_conv"
    else:
        last_fn = lambda j: f"encoder.last_conv.{j}"
    params["last"], state["last"] = _ops(sd, last_fn, last)
    return params, state


def _decoder(sd, cfg):
    first, stages = cfg.decoder_spec()
    params = {"first": None, "stages": []}
    state = {"first": None, "stages": []}
    if cfg.archi == "dcgan":
        first_fn = lambda j: "decoder.first_upconv"
    else:
        first_fn = lambda j: f"decoder.first_upconv.{j}"
    params["first"], state["first"] = _ops(sd, first_fn, first)
    for i, ops in enumerate(stages):
        if cfg.archi == "dcgan":
            assert len(ops) == 1
            # blocks are Sequentials at decoder.conv.{i}; the last stage is a
            # raw ConvTranspose2d at the same index
            prefix_fn = lambda j, i=i: f"decoder.conv.{i}"
        else:
            prefix_fn = lambda j, i=i: f"decoder.conv.{i}.{j}"
        p, s = _ops(sd, prefix_fn, ops)
        params["stages"].append(p)
        state["stages"].append(s)
    return params, state


def _mlp(sd, prefix, n_layers):
    params = []
    for il in range(n_layers):
        sub = f"{prefix}.module.{il}.0" if il == 0 else f"{prefix}.module.{il}.1"
        params.append(_linear(sd, sub))
    return params


def _lstm(sd, prefix):
    return {
        "w_ih": _np(sd[f"{prefix}.weight_ih_l0"]).T,
        "w_hh": _np(sd[f"{prefix}.weight_hh_l0"]).T,
        "b_ih": _np(sd[f"{prefix}.bias_ih_l0"]),
        "b_hh": _np(sd[f"{prefix}.bias_hh_l0"]),
    }


def convert_state_dict(sd, cfg):
    """Converts a reference torch state_dict (mapping key -> array-like) into
    srvp_tpu (params, state) pytrees for SRVPConfig `cfg`."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    enc_p, enc_s = _encoder(sd, cfg)
    dec_p, dec_s = _decoder(sd, cfg)
    params = {
        "encoder": enc_p,
        "decoder": dec_p,
        "w_proj": _linear(sd, "w_proj.0"),
        "w_inf": _linear(sd, "w_inf.0"),
        "q_y": _mlp(sd, "q_y", cfg.nlayers_inf),
        "inf_z": _lstm(sd, "inf_z"),
        "q_z": _linear(sd, "q_z"),
        "p_z": _mlp(sd, "p_z", cfg.nlayers_res),
        "dynamics": _mlp(sd, "dynamics", cfg.nlayers_res),
    }
    state = {"encoder": enc_s, "decoder": dec_s}
    return params, state


def load_torch_checkpoint(path, cfg):
    """Loads a reference .pt checkpoint file (requires torch, CPU-only)."""
    import torch
    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_state_dict(sd, cfg)
