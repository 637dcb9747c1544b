"""Export srvp-tpu checkpoints to the reference's PyTorch state_dict format.

The inverse of torch_convert: lets models trained here be evaluated with the
reference's torch tooling (or any downstream consumer of reference .pt
files). Layout transforms are the exact inverses (HWIO -> OIHW, (kh,kw,I,O)
-> (Cin,Cout,kh,kw), (in,out) -> (out,in), (in,4h) -> (4h,in)).
"""

import numpy as np


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _conv_w(kernel):
    return _np(kernel).transpose(3, 2, 0, 1)


def _convt_w(kernel):
    # inverse of torch_convert._convt_w: un-flip, then HWIO -> (Cin,Cout,kh,kw)
    return _np(kernel)[::-1, ::-1].transpose(2, 3, 0, 1).copy()


def _linear(sd, prefix, params):
    sd[f"{prefix}.weight"] = _np(params["kernel"]).T
    sd[f"{prefix}.bias"] = _np(params["bias"])


def _bn(sd, prefix, params, state):
    sd[f"{prefix}.weight"] = _np(params["scale"])
    sd[f"{prefix}.bias"] = _np(params["bias"])
    sd[f"{prefix}.running_mean"] = _np(state["mean"])
    sd[f"{prefix}.running_var"] = _np(state["var"])
    sd[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def _is_raw(spec):
    return (not spec.bn) and spec.activation == "none"


def _block(sd, prefix, spec, params, state):
    w = _convt_w(params["conv"]["kernel"]) if spec.kind == "convt" \
        else _conv_w(params["conv"]["kernel"])
    sd[f"{prefix}.weight" if _is_raw(spec) else f"{prefix}.0.weight"] = w
    if spec.bn:
        _bn(sd, f"{prefix}.1", params["bn"], state["bn"])


def _ops(sd, prefix_fn, ops, params, state):
    for j, ((op, spec), p, s) in enumerate(zip(ops, params, state)):
        if op == "block":
            _block(sd, prefix_fn(j), spec, p, s)


def _mlp(sd, prefix, params):
    for il, layer in enumerate(params):
        sub = f"{prefix}.module.{il}.0" if il == 0 else f"{prefix}.module.{il}.1"
        _linear(sd, sub, layer)


def export_state_dict(params, state, cfg):
    """srvp-tpu (params, state) pytrees -> reference-format state_dict of
    numpy arrays (torch.save-able after tensor conversion)."""
    sd = {}
    enc_stages, enc_last = cfg.encoder_spec()
    dec_first, dec_stages = cfg.decoder_spec()

    for i, ops in enumerate(enc_stages):
        fn = (lambda j, i=i: f"encoder.conv.{i}") if cfg.archi == "dcgan" \
            else (lambda j, i=i: f"encoder.conv.{i}.{j}")
        _ops(sd, fn, ops, params["encoder"]["stages"][i],
             state["encoder"]["stages"][i])
    fn = (lambda j: "encoder.last_conv") if cfg.archi == "dcgan" \
        else (lambda j: f"encoder.last_conv.{j}")
    _ops(sd, fn, enc_last, params["encoder"]["last"], state["encoder"]["last"])

    fn = (lambda j: "decoder.first_upconv") if cfg.archi == "dcgan" \
        else (lambda j: f"decoder.first_upconv.{j}")
    _ops(sd, fn, dec_first, params["decoder"]["first"], state["decoder"]["first"])
    for i, ops in enumerate(dec_stages):
        fn = (lambda j, i=i: f"decoder.conv.{i}") if cfg.archi == "dcgan" \
            else (lambda j, i=i: f"decoder.conv.{i}.{j}")
        _ops(sd, fn, ops, params["decoder"]["stages"][i],
             state["decoder"]["stages"][i])

    _linear(sd, "w_proj.0", params["w_proj"])
    _linear(sd, "w_inf.0", params["w_inf"])
    _mlp(sd, "q_y", params["q_y"])
    sd["inf_z.weight_ih_l0"] = _np(params["inf_z"]["w_ih"]).T
    sd["inf_z.weight_hh_l0"] = _np(params["inf_z"]["w_hh"]).T
    sd["inf_z.bias_ih_l0"] = _np(params["inf_z"]["b_ih"])
    sd["inf_z.bias_hh_l0"] = _np(params["inf_z"]["b_hh"])
    _linear(sd, "q_z", params["q_z"])
    _mlp(sd, "p_z", params["p_z"])
    _mlp(sd, "dynamics", params["dynamics"])
    return sd


def save_torch_checkpoint(path, params, state, cfg):
    """Writes a reference-loadable .pt file (requires torch)."""
    import torch
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, state, cfg).items()}
    torch.save(sd, path)
