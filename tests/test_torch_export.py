"""Checkpoint export roundtrip: srvp-tpu -> reference .pt format -> srvp-tpu."""

import numpy as np
import pytest

import jax

from srvp_tpu.models import srvp
from srvp_tpu.models.srvp import SRVPConfig
from srvp_tpu.utils.torch_convert import convert_state_dict
from srvp_tpu.utils.torch_export import export_state_dict


@pytest.mark.parametrize("archi,skipco", [("dcgan", False), ("vgg", True)])
def test_export_convert_roundtrip(archi, skipco):
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=skipco,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi=archi)
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    sd = export_state_dict(params, state, cfg)
    params2, state2 = convert_state_dict(sd, cfg)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(state2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_keys_load_into_torch_mirror():
    """The exported state_dict must load into a reference-keyed torch model
    with strict=True (exact key + shape agreement)."""
    import torch
    from tests.torch_ref import TorchSRVP
    from tests.test_model_parity import make_cfg
    cfg = make_cfg("vgg", skipco=True)
    params, state = srvp.init(jax.random.PRNGKey(1), cfg)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, state, cfg).items()}
    tmodel = TorchSRVP(cfg)
    tmodel.load_state_dict(sd, strict=True)
