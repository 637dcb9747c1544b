"""Checkpoint conversion at FULL production dims (flagship smmnist/dcgan and
KTH vgg+skipco hyperparameters).

The per-layer goldens (tests/test_model_parity.py) run at tiny dims for CPU
speed; layout bugs that only appear at scale (channel-count-dependent
reshape/transpose mistakes, LSTM gate blocks at nhx=128, skip-channel
doubling at nf=64) would otherwise first surface when real released
checkpoints arrive. These tests write a REAL .pt file with torch.save and
go through the same load_torch_checkpoint path `test.py --model_name
model.pt` uses (/root/reference/test.py:196-204), then assert forward
parity against the torch mirror at the full dims.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from srvp_tpu.models import srvp
from srvp_tpu.utils.torch_convert import load_torch_checkpoint
from tests.test_model_parity import shared_noise
from tests.torch_ref import TorchSRVP

# Full-scale tolerance: single fp32 ops accumulate over 64-channel convs;
# observed max deltas are ~1e-4 on latents, pixel outputs tighter.
ATOL = 5e-4

FULL_CONFIGS = {
    # reference README training commands
    "smmnist-dcgan": srvp.SRVPConfig(
        nx=64, nc=1, nf=64, nhx=128, ny=20, nz=20, skipco=False, nt_inf=5,
        nh_inf=256, nlayers_inf=3, nh_res=512, nlayers_res=4, archi="dcgan"),
    "kth-vgg": srvp.SRVPConfig(
        nx=64, nc=1, nf=64, nhx=128, ny=50, nz=50, skipco=True, nt_inf=3,
        nh_inf=256, nlayers_inf=3, nh_res=512, nlayers_res=4, archi="vgg"),
    # 3-channel input: covers channel-count-dependent paths in the stem
    # conv / final decoder conv that nc=1 configs cannot
    "bair-vgg": srvp.SRVPConfig(
        nx=64, nc=3, nf=64, nhx=128, ny=50, nz=50, skipco=True, nt_inf=2,
        nh_inf=256, nlayers_inf=3, nh_res=512, nlayers_res=4, archi="vgg"),
}


@pytest.mark.slow
@pytest.mark.parametrize("name,o", [("smmnist-dcgan", 1), ("kth-vgg", 2),
                                    ("bair-vgg", 2)])
def test_pt_checkpoint_roundtrip_full_dims(name, o, tmp_path):
    cfg = FULL_CONFIGS[name]
    torch.manual_seed(0)
    tmodel = TorchSRVP(cfg).eval()
    pt_path = tmp_path / "model.pt"
    torch.save(tmodel.state_dict(), pt_path)

    params, state = load_torch_checkpoint(str(pt_path), cfg)

    t_cond, bsz, nt = 5, 2, 7
    x = np.random.RandomState(3).rand(t_cond, bsz, 64, 64, cfg.nc) \
        .astype(np.float32)
    key = jax.random.PRNGKey(11)
    out = srvp.forward(cfg, params, state, jnp.asarray(x), nt,
                       oversampling=o, rng=key, train=False)

    eps_y, eps_pri, eps_pos = shared_noise(key, o * (nt - 1), bsz, cfg.ny,
                                           cfg.nz)
    x_t = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))
    with torch.no_grad():
        tx, ty, tz, tw, tqy, tqp, tpp, tres = tmodel.forward_eval(
            x_t, nt, o, eps_y, eps_pri, eps_pos)

    np.testing.assert_allclose(np.asarray(out.w), tw.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.q_y_0_params), tqy.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.y), ty.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.z), tz.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.q_z_params), tqp.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.p_z_params), tpp.numpy(),
                               atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.res), tres.numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out.x_), (0, 1, 4, 2, 3)), tx.numpy(),
        atol=ATOL)
