"""Compact torch mirror of the reference SRVP architecture, for golden tests.

Built from loops over the same layer specs as srvp_tpu (NOT copied from the
reference); attribute names and container nesting are chosen to produce the
same state_dict key names as reference checkpoints, so these tests exercise
srvp_tpu.utils.torch_convert exactly the way real pretrained .pt files will.

Stochastic draws take explicit epsilon noise so torch and JAX runs can share
the same reparameterization noise.
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


def rsample_t(raw, eps):
    loc, raw_scale = torch.chunk(raw, 2, -1)
    return loc + eps * (F.softplus(raw_scale) + 1e-8)


def _act(name):
    return {"leaky_relu": nn.LeakyReLU(0.2), "tanh": nn.Tanh(),
            "relu": nn.ReLU(), "none": None}[name]


def _torch_block(spec):
    """Builds the torch module for one srvp_tpu ConvBlockSpec."""
    conv_cls = nn.Conv2d if spec.kind == "conv" else nn.ConvTranspose2d
    conv = conv_cls(spec.in_ch, spec.out_ch, spec.kernel, spec.stride,
                    spec.padding, bias=False)
    if not spec.bn and spec.activation == "none":
        return conv  # raw layer (reference decoder tails)
    mods = [conv]
    if spec.bn:
        mods.append(nn.BatchNorm2d(spec.out_ch))
    act = _act(spec.activation)
    if act is not None:
        mods.append(act)
    return nn.Sequential(*mods)


def _torch_ops(ops, as_sequential):
    mods = []
    for op, spec in ops:
        if op == "block":
            mods.append(_torch_block(spec))
        elif op == "maxpool":
            mods.append(nn.MaxPool2d(2, 2))
        elif op == "upsample":
            mods.append(nn.Upsample(scale_factor=2, mode="nearest"))
    if as_sequential:
        return nn.Sequential(*mods)
    assert len(mods) == 1
    return mods[0]


class TorchEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        from srvp_tpu.models.conv import encoder_spec
        stages, last = encoder_spec(cfg.archi, cfg.nc, cfg.nhx, cfg.nf)
        seq = cfg.archi != "dcgan"
        self.conv = nn.ModuleList([_torch_ops(ops, seq) for ops in stages])
        self.last_conv = _torch_ops(last, seq)
        self.nh = cfg.nhx

    def forward(self, x):
        skips = []
        h = x
        for stage in self.conv:
            h = stage(h)
            skips.append(h)
        h = self.last_conv(h).view(-1, self.nh)
        return h, skips[::-1]


class TorchDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        from srvp_tpu.models.conv import decoder_spec
        first, stages = decoder_spec(cfg.archi, cfg.nc, cfg.nh_inf + cfg.ny,
                                     cfg.nf, cfg.skipco)
        seq = cfg.archi != "dcgan"
        self.first_upconv = _torch_ops(first, seq)
        self.conv = nn.ModuleList([_torch_ops(ops, seq) for ops in stages])

    def forward(self, z, skips=None):
        h = self.first_upconv(z.view(*z.shape, 1, 1))
        for i, stage in enumerate(self.conv):
            if skips is not None:
                h = torch.cat([h, skips[i]], 1)
            h = stage(h)
        return torch.sigmoid(h)


def _torch_mlp(n_inp, n_hid, n_out, n_layers):
    from srvp_tpu.models.mlp import mlp_dims
    blocks = []
    for il, (d_in, d_out) in enumerate(mlp_dims(n_inp, n_hid, n_out, n_layers)):
        mods = ([] if il == 0 else [nn.ReLU()]) + [nn.Linear(d_in, d_out)]
        blocks.append(nn.Sequential(*mods))
    wrapper = nn.Module()
    wrapper.module = nn.Sequential(*blocks)
    wrapper.forward = wrapper.module.forward
    return wrapper


class TorchSRVP(nn.Module):
    """Eval-mode reference-semantics SRVP with injectable noise."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = TorchEncoder(cfg)
        self.decoder = TorchDecoder(cfg)
        self.w_proj = nn.Sequential(nn.Linear(cfg.nhx, cfg.nh_inf), nn.ReLU())
        self.w_inf = nn.Sequential(nn.Linear(cfg.nh_inf, cfg.nh_inf), nn.Tanh())
        self.q_y = _torch_mlp(cfg.nhx * cfg.nt_inf, cfg.nh_inf, cfg.ny * 2,
                              cfg.nlayers_inf)
        self.inf_z = nn.LSTM(cfg.nhx, cfg.nh_inf, 1)
        self.q_z = nn.Linear(cfg.nh_inf, cfg.nz * 2)
        self.p_z = _torch_mlp(cfg.ny, cfg.nh_res, cfg.nz * 2, cfg.nlayers_res)
        self.dynamics = _torch_mlp(cfg.ny + cfg.nz, cfg.nh_res, cfg.ny,
                                   cfg.nlayers_res)

    def encode_eval(self, x):
        nt, bsz = x.shape[0], x.shape[1]
        hx, skips = self.encoder(x.reshape(nt * bsz, *x.shape[2:]))
        hx = hx.view(nt, bsz, self.cfg.nhx)
        if self.cfg.skipco:
            skips = [s.view(nt, bsz, *s.shape[1:])[-1] for s in skips]
        else:
            skips = None
        return hx, skips

    def infer_w_eval(self, hx):
        h = self.w_proj(hx[-self.cfg.nt_inf:])
        return self.w_inf(h.sum(0))

    def infer_y(self, hx, eps_y):
        bsz = hx.shape[1]
        q = self.q_y(hx.permute(1, 0, 2).reshape(bsz, -1))
        return rsample_t(q, eps_y), q

    def generate(self, y_0, hx, nt, o, eps_pri, eps_pos):
        """Euler rollout with reference semantics; eps_* indexed per substep."""
        hx_z = self.inf_z(hx)[0] if hx is not None and hx.shape[0] > 0 else None
        nt_hx = 0 if hx_z is None else hx_z.shape[0]
        y, z, qp, pp, res = [y_0], [], [], [], []
        y_t, t_data = y_0, 0
        for k in range(1, o * (nt - 1) + 1):
            prev, t_data = t_data, (k + o - 1) // o
            if t_data != prev:
                p_par = self.p_z(y_t)
                pp.append(p_par)
                if t_data < nt_hx:
                    q_par = self.q_z(hx_z[t_data])
                    qp.append(q_par)
                    z_t = rsample_t(q_par, eps_pos[k - 1])
                else:
                    z_t = rsample_t(p_par, eps_pri[k - 1])
                z.append(z_t)
            else:
                z_t = z[-1]
            r = (1.0 / o) * self.dynamics(torch.cat([y_t, z_t], 1))
            y_t = y_t + r
            if k % o == 0:
                y.append(y_t)
            res.append(r)
        stack = lambda lst: torch.stack(lst) if lst else None
        return torch.stack(y), stack(z), stack(qp), stack(pp), torch.stack(res)

    def decode(self, w, y, skips):
        nt, bsz = y.shape[0], y.shape[1]
        w_flat = w.repeat(nt, 1, 1).view(nt * bsz, -1)
        dec_inp = torch.cat([w_flat, y.reshape(nt * bsz, -1)], 1)
        if skips is not None:
            skips = [s.expand(nt, *s.shape).reshape(nt * bsz, *s.shape[1:])
                     for s in skips]
        x = self.decoder(dec_inp, skips)
        return x.view(nt, bsz, *x.shape[1:])

    def forward_eval(self, x, nt, o, eps_y, eps_pri, eps_pos):
        hx, skips = self.encode_eval(x)
        w = self.infer_w_eval(hx)
        y_0, q_y_0 = self.infer_y(hx[: self.cfg.nt_inf], eps_y)
        y, z, qp, pp, res = self.generate(y_0, hx, nt, o, eps_pri, eps_pos)
        x_ = self.decode(w, y, skips)
        return x_, y, z, w, q_y_0, qp, pp, res
