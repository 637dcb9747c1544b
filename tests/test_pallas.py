"""Fused Pallas rollout vs lax.scan parity (interpreter mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srvp_tpu.models import srvp
from srvp_tpu.models.srvp import SRVPConfig


def make_cfg(ny=20, nz=20):
    return SRVPConfig(nx=64, nc=1, nf=4, nhx=16, ny=ny, nz=nz, skipco=False,
                      nt_inf=3, nh_inf=24, nlayers_inf=2, nh_res=64,
                      nlayers_res=4, archi="dcgan")


@pytest.mark.parametrize("oversampling,nt,ny,nz", [
    (1, 8, 20, 20),
    (2, 6, 50, 50),
    (2, 5, 20, 12),   # ny != nz
])
def test_fused_prior_rollout_matches_scan(oversampling, nt, ny, nz):
    cfg = make_cfg(ny, nz)
    params, _ = srvp.init(jax.random.PRNGKey(0), cfg, res_gain=1.2)
    bsz = 5
    y_0 = jnp.asarray(np.random.RandomState(1).randn(bsz, ny).astype(np.float32))
    rng = jax.random.PRNGKey(7)

    ref = srvp.generate(cfg, params, y_0, None, nt, oversampling=oversampling,
                        rng=rng, train=False)
    fused = srvp.generate_prior_fused(cfg, params, y_0, nt,
                                      oversampling=oversampling, rng=rng,
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(fused.y), np.asarray(ref.y),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fused.res), np.asarray(ref.res),
                               rtol=1e-4, atol=1e-5)
    assert fused.y.shape == (nt, bsz, ny)


def test_fused_keeps_intermediate_states():
    cfg = make_cfg()
    params, _ = srvp.init(jax.random.PRNGKey(2), cfg)
    y_0 = jnp.zeros((3, cfg.ny))
    rng = jax.random.PRNGKey(0)
    out = srvp.generate_prior_fused(cfg, params, y_0, 4, oversampling=3,
                                    rng=rng, remove_intermediate=False,
                                    interpret=True)
    ref = srvp.generate(cfg, params, y_0, None, 4, oversampling=3, rng=rng,
                        train=False, remove_intermediate=False)
    assert out.y.shape == (10, 3, cfg.ny)  # 1 + 3*(4-1)
    np.testing.assert_allclose(np.asarray(out.y), np.asarray(ref.y),
                               rtol=1e-4, atol=1e-5)
