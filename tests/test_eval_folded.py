"""Folded-sample evaluator coverage: vgg+skipco, sample independence."""

import numpy as np

import jax
import jax.numpy as jnp

from srvp_tpu import eval_lib
from srvp_tpu.models import srvp
from srvp_tpu.models.srvp import SRVPConfig


def test_folded_chunk_vgg_skipco():
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=True,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="vgg")
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    # untrained normal(0.02) decoders attenuate the latent to < 1e-7 in pixel
    # space (skips dominate); scale the decoder up so samples are visibly
    # stochastic for the independence assertion below
    params["decoder"] = jax.tree_util.tree_map(
        lambda a: a * 6.0 if a.ndim == 4 else a, params["decoder"])
    nt_cond, nt_test, bsz, n_samples = 3, 6, 2, 4
    rng = np.random.RandomState(0)
    x = rng.rand(nt_test, bsz, 64, 64, 1).astype(np.float32)
    chunk_fn = eval_lib.make_test_chunk(cfg, nt_cond, nt_test, 1, 2)
    keys = jax.random.split(jax.random.PRNGKey(5), n_samples)
    x_pred, x_rec, metrics = chunk_fn(params, state, jnp.asarray(x[:nt_cond]),
                                      jnp.asarray(x[nt_cond:]), keys)
    assert x_pred.shape == (n_samples, bsz, nt_test - nt_cond, 64, 64, 1)
    assert x_rec.shape == (bsz, nt_cond, 64, 64, 1)
    assert x_pred.dtype == jnp.uint8
    psnr = np.asarray(metrics["psnr"])
    assert psnr.shape == (n_samples, bsz)
    assert np.all(np.isfinite(psnr))
    # samples are stochastic: not all identical
    assert np.abs(np.asarray(x_pred[0], np.int32)
                  - np.asarray(x_pred[1], np.int32)).max() > 0
    # determinism: same keys -> same outputs
    x_pred2, _, metrics2 = chunk_fn(params, state, jnp.asarray(x[:nt_cond]),
                                    jnp.asarray(x[nt_cond:]), keys)
    np.testing.assert_array_equal(np.asarray(x_pred), np.asarray(x_pred2))
    np.testing.assert_array_equal(np.asarray(metrics["psnr"]),
                                  np.asarray(metrics2["psnr"]))


def test_folded_chunk_fused_rollout_matches_scan_chunk():
    """The fused-rollout evaluator must produce the same predictions as the
    scan evaluator (interpreter-mode Pallas on CPU)."""
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="dcgan")
    params, state = srvp.init(jax.random.PRNGKey(1), cfg)
    nt_cond, nt_test, bsz, n_samples = 2, 5, 2, 2
    x = np.random.RandomState(1).rand(nt_test, bsz, 64, 64, 1).astype(np.float32)
    keys = jax.random.split(jax.random.PRNGKey(9), n_samples)

    import srvp_tpu.models.srvp as srvp_mod
    orig = srvp_mod.generate_prior_fused

    def interp_fused(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    srvp_mod.generate_prior_fused = interp_fused
    try:
        fn_scan = eval_lib.make_test_chunk(cfg, nt_cond, nt_test, 1, 1,
                                           use_fused_rollout=False)
        fn_fused = eval_lib.make_test_chunk(cfg, nt_cond, nt_test, 1, 1,
                                            use_fused_rollout=True)
        a = fn_scan(params, state, jnp.asarray(x[:nt_cond]),
                    jnp.asarray(x[nt_cond:]), keys)
        b = fn_fused(params, state, jnp.asarray(x[:nt_cond]),
                     jnp.asarray(x[nt_cond:]), keys)
    finally:
        srvp_mod.generate_prior_fused = orig
    # uint8 predictions may differ by 1 count on float rounding boundaries
    diff = np.abs(np.asarray(a[0], np.int32) - np.asarray(b[0], np.int32))
    assert diff.max() <= 1
    np.testing.assert_allclose(np.asarray(a[2]["psnr"]),
                               np.asarray(b[2]["psnr"]), rtol=1e-4)
