#!/usr/bin/env python
"""Builds tests/golden/lpips_golden.npz by running the REFERENCE LPIPS code.

The round-1 LPIPS test compared against an inline torch mirror written here,
which is silent on shared misunderstandings of the reference pipeline. This
script instead executes the reference's vendored implementation
(/root/reference/metrics/lpips/networks_basic.py PNetLin — scaling layer,
alexnet slices, unit-normalize, lin heads, spatial average) with
deterministic weights, and freezes:

  * the alexnet backbone weights in torchvision state_dict key format
  * the lin-head weights in the official alex.pth key format
  * input image pairs in [-1, 1]
  * the reference forward output

torchvision is not installed (and no pretrained weights are reachable), so a
stub torchvision module provides `models.alexnet(pretrained=False)` with the
standard feature stack (conv 3->64 k11 s4 p2, pool3/2, conv 64->192 k5 p2,
pool3/2, conv 192->384 k3 p1, conv 384->256 k3 p1, conv 256->256 k3 p1,
pool3/2 — the published AlexNet used by LPIPS); weights are then overwritten
with seeded values, so no pretrained semantics are involved. The JAX side
(srvp_tpu/metrics/lpips.py + its converters) must reproduce the frozen
output through convert_alexnet_state_dict / convert_lin_state_dict
(tests/test_lpips.py::test_lpips_reference_golden).
"""

import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "golden", "lpips_golden.npz")


def _alexnet_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, kernel_size=11, stride=4, padding=2),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
        nn.Conv2d(64, 192, kernel_size=5, padding=2),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
        nn.Conv2d(192, 384, kernel_size=3, padding=1),
        nn.ReLU(inplace=True),
        nn.Conv2d(384, 256, kernel_size=3, padding=1),
        nn.ReLU(inplace=True),
        nn.Conv2d(256, 256, kernel_size=3, padding=1),
        nn.ReLU(inplace=True),
        nn.MaxPool2d(kernel_size=3, stride=2),
    )


def _install_torchvision_stub():
    class _AlexNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.features = _alexnet_features()

    tv_models = types.ModuleType("torchvision.models")
    tv_models.alexnet = lambda pretrained=False, **kw: _AlexNet()
    tv = types.ModuleType("torchvision")
    tv.models = tv_models
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tv_models


def _install_skimage_stub():
    # metrics/lpips/__init__ pulls loss.py which imports
    # skimage.measure.compare_ssim (unused by PNetLin); stub it out.
    measure = types.ModuleType("skimage.measure")
    measure.compare_ssim = None
    sk = types.ModuleType("skimage")
    sk.measure = measure
    sys.modules["skimage"] = sk
    sys.modules["skimage.measure"] = measure


def main():
    _install_torchvision_stub()
    _install_skimage_stub()
    sys.path.insert(0, "/root/reference")
    from metrics.lpips import networks_basic

    torch.manual_seed(1234)
    net = networks_basic.PNetLin(pnet_rand=True, pnet_type="alex",
                                 use_dropout=True, spatial=False,
                                 version="0.1", lpips=True)
    net.eval()

    # Overwrite weights with well-scaled deterministic values (default torch
    # init gives huge activations through 5 conv layers; keep them tame).
    rng = np.random.RandomState(42)
    with torch.no_grad():
        for p in net.net.parameters():
            p.copy_(torch.from_numpy(
                (rng.randn(*p.shape) * 0.05).astype(np.float32)))
        for lin in net.lins:
            conv = lin.model[1]
            conv.weight.copy_(torch.from_numpy(np.abs(
                rng.randn(*conv.weight.shape).astype(np.float32))))

    # Extract the backbone in torchvision state_dict key format. The slices
    # partition features indices [0:2),[2:5),[5:8),[8:10),[10:12); modules
    # keep their original feature indices as names inside each slice.
    bb_sd = {}
    for slice_name in ["slice1", "slice2", "slice3", "slice4", "slice5"]:
        for idx, mod in getattr(net.net, slice_name).named_children():
            if isinstance(mod, nn.Conv2d):
                bb_sd[f"features.{idx}.weight"] = mod.weight.detach().numpy()
                bb_sd[f"features.{idx}.bias"] = mod.bias.detach().numpy()
    lin_sd = {}
    for li, lin in enumerate(net.lins):
        lin_sd[f"lin{li}.model.1.weight"] = \
            lin.model[1].weight.detach().numpy()

    rng_x = np.random.RandomState(7)
    x = (rng_x.rand(6, 3, 64, 64).astype(np.float32) * 2 - 1)
    y = np.clip(x + 0.3 * rng_x.randn(*x.shape).astype(np.float32), -1, 1)
    # include an identical pair and a maximally different pair
    y[0] = x[0]
    y[1] = -x[1]

    with torch.no_grad():
        val = net.forward(torch.from_numpy(x), torch.from_numpy(y))
    out = val.flatten().numpy()

    np.savez_compressed(
        OUT, x=x, y=y, lpips=out,
        **{f"bb/{k}": v for k, v in bb_sd.items()},
        **{f"lin/{k}": v for k, v in lin_sd.items()})
    print(f"wrote {OUT}: lpips={out}")


if __name__ == "__main__":
    main()
