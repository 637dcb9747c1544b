"""LPIPS perceptual metric (net-lin, alex backbone) in JAX.

Re-implements the subset of richzhang/PerceptualSimilarity that the reference
actually uses (/root/reference/metrics/lpips/, only `alex` is exercised per
test.py:172 + dist_model.py defaults):
  * ScalingLayer: x in [-1,1] -> (x - shift) / scale with the published
    constants (networks_basic.py:95-103)
  * AlexNet feature slices after each of the 5 ReLUs
    (pretrained_networks.py alexnet slices; channels 64,192,384,256,256)
  * unit-normalize features along channels, squared diff, learned 1x1 conv
    per layer, spatial average, sum over layers (networks_basic.py:64-92)

Weights are loaded from torch .pth files:
  * linear heads: {lpips_dir}/alex.pth (the official v0.1 weights the
    reference points at, README.md:141-147)
  * backbone: a torchvision alexnet state_dict ({lpips_dir}/alexnet.pth or
    alexnet-owt-*.pth) — torchvision normally downloads this; in offline
    environments place the file next to the linear weights.
"""

import glob
import os

import numpy as np

import jax.numpy as jnp

from srvp_tpu.ops.convops import conv2d, max_pool2d

# (out_ch, in_ch, kernel, stride, pad) for torchvision alexnet .features convs
_ALEX_CONVS = [
    (64, 3, 11, 4, 2),
    (192, 64, 5, 1, 2),
    (384, 192, 3, 1, 1),
    (256, 384, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
# maxpool(3,2) sits after ReLUs 1 and 2 (before convs 2 and 3)
_POOL_BEFORE = {1, 2}

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def alex_lpips_apply(params, x, y):
    """LPIPS distance for NHWC images in [-1, 1]. Returns (N,)."""
    shift = jnp.asarray(_SHIFT)
    scale = jnp.asarray(_SCALE)
    val = None
    fx, fy = (x - shift) / scale, (y - shift) / scale
    for i, (conv, lin) in enumerate(zip(params["convs"], params["lins"])):
        if i in _POOL_BEFORE:
            fx = max_pool2d(fx, 3, 2)
            fy = max_pool2d(fy, 3, 2)
        stride, pad = _ALEX_CONVS[i][3], _ALEX_CONVS[i][4]
        fx = jnp.maximum(conv2d(fx, conv["kernel"], stride, pad) + conv["bias"], 0)
        fy = jnp.maximum(conv2d(fy, conv["kernel"], stride, pad) + conv["bias"], 0)
        nx = fx / (jnp.sqrt(jnp.sum(fx * fx, axis=-1, keepdims=True)) + 1e-10)
        ny = fy / (jnp.sqrt(jnp.sum(fy * fy, axis=-1, keepdims=True)) + 1e-10)
        diff = jnp.square(nx - ny)
        # 1x1 'lin' conv with non-negative weights == weighted channel sum
        layer_val = jnp.mean(diff @ lin, axis=(1, 2))  # (N, 1)
        val = layer_val if val is None else val + layer_val
    return val[:, 0]


def convert_alexnet_state_dict(sd):
    """torchvision alexnet state_dict -> backbone conv params (HWIO)."""
    convs = []
    feature_idx = [0, 3, 6, 8, 10]
    for i in feature_idx:
        w = np.asarray(sd[f"features.{i}.weight"], np.float32).transpose(2, 3, 1, 0)
        b = np.asarray(sd[f"features.{i}.bias"], np.float32)
        convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
    return convs


def convert_lin_state_dict(sd):
    """alex.pth linear-head state_dict -> list of (C, 1) weight columns."""
    lins = []
    for i in range(5):
        w = np.asarray(sd[f"lin{i}.model.1.weight"], np.float32)  # (1, C, 1, 1)
        lins.append(jnp.asarray(w[:, :, 0, 0].T))                 # (C, 1)
    return lins


def load_lpips_params(lpips_dir):
    """Loads backbone + linear-head weights from torch files in lpips_dir."""
    import torch

    lin_path = os.path.join(lpips_dir, "alex.pth")
    if not os.path.exists(lin_path):
        nested = os.path.join(lpips_dir, "weights", "v0.1", "alex.pth")
        if os.path.exists(nested):
            lin_path = nested
        else:
            raise FileNotFoundError(f"LPIPS linear weights not found: {lin_path}")
    candidates = ([os.path.join(lpips_dir, "alexnet.pth")]
                  + sorted(glob.glob(os.path.join(lpips_dir, "alexnet-owt-*.pth"))))
    backbone_path = next((p for p in candidates if os.path.exists(p)), None)
    if backbone_path is None:
        raise FileNotFoundError(
            f"AlexNet backbone weights not found in {lpips_dir} "
            "(expected alexnet.pth or alexnet-owt-*.pth; torchvision "
            "downloads these online — place a copy for offline use)")
    lin_sd = torch.load(lin_path, map_location="cpu")
    bb_sd = torch.load(backbone_path, map_location="cpu")
    lin_sd = {k: v.numpy() for k, v in lin_sd.items()}
    bb_sd = {k: v.numpy() for k, v in bb_sd.items()}
    return {"convs": convert_alexnet_state_dict(bb_sd),
            "lins": convert_lin_state_dict(lin_sd)}


def make_video_lpips(lpips_dir):
    """Returns fn(pred, target): (T,B,H,W,C) in [0,1] -> per-frame LPIPS (T,B).

    Mirrors test.py's _lpips_wrapper (/root/reference/test.py:60-88):
    grayscale is repeated to 3 channels; PerceptualLoss scales [0,1]->[-1,1]
    (metrics/lpips/loss.py:38-40).
    """
    params = load_lpips_params(lpips_dir)

    def video_lpips(pred, target):
        t, b = pred.shape[0], pred.shape[1]
        if pred.shape[-1] == 1:
            pred = jnp.tile(pred, (1, 1, 1, 1, 3))
            target = jnp.tile(target, (1, 1, 1, 1, 3))
        flat_p = (pred.reshape((t * b,) + pred.shape[2:]) * 2.0 - 1.0)
        flat_t = (target.reshape((t * b,) + target.shape[2:]) * 2.0 - 1.0)
        return alex_lpips_apply(params, flat_p.astype(jnp.float32),
                                flat_t.astype(jnp.float32)).reshape(t, b)

    return video_lpips
