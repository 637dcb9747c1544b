"""Device-side selection must reproduce host-side selection exactly."""

import numpy as np

import jax

from srvp_tpu import eval_lib
from srvp_tpu.models import srvp
from srvp_tpu.models.srvp import SRVPConfig


def test_device_selection_matches_host_selection():
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="dcgan")
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    params["decoder"] = jax.tree_util.tree_map(
        lambda a: a * 6.0 if a.ndim == 4 else a, params["decoder"])
    nt_cond, nt_test = 2, 6
    n_samples, chunk = 6, 3
    base_key = jax.random.PRNGKey(3)
    metric_names = ["psnr", "ssim"]

    def batches():
        rng = np.random.RandomState(0)
        for _ in range(2):
            yield rng.rand(nt_test, 3, 64, 64, 1).astype(np.float32)

    host_chunk = eval_lib.make_test_chunk(cfg, nt_cond, nt_test, 1, 1)
    r1, s1, c1, g1 = eval_lib.run_test(
        host_chunk, params, state, batches(), nt_cond, nt_test, n_samples,
        chunk, base_key, metric_names, progress=False)

    sel_chunk = eval_lib.make_select_chunk(cfg, nt_cond, nt_test, 1, 1,
                                           metric_names)
    r2, s2, c2, g2 = eval_lib.run_test_device(
        sel_chunk, params, state, batches(), nt_cond, nt_test, n_samples,
        chunk, base_key, metric_names, (64, 64, 1), progress=False)

    for name in metric_names:
        np.testing.assert_allclose(r1[name], r2[name], rtol=1e-6)
    for key in s1:
        np.testing.assert_array_equal(s1[key], s2[key])
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(g1, g2)


def _tiny_eval_setup():
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="dcgan")
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    params["decoder"] = jax.tree_util.tree_map(
        lambda a: a * 6.0 if a.ndim == 4 else a, params["decoder"])
    return cfg, params, state


def test_sharded_eval_matches_single_device():
    """Multi-device run_test_device must produce the same results.npz
    content as single-device — the eval counterpart of the sharded-training
    equivalence test (VERDICT r2 item 2). Includes a ragged final batch so
    the edge-padding path is exercised under the mesh."""
    import jax as _jax
    if len(_jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    from srvp_tpu.parallel import make_mesh

    cfg, params, state = _tiny_eval_setup()
    nt_cond, nt_test = 2, 6
    n_samples, chunk = 4, 2
    base_key = jax.random.PRNGKey(5)
    metric_names = ["psnr", "ssim"]

    def batches():
        rng = np.random.RandomState(1)
        yield rng.rand(nt_test, 8, 64, 64, 1).astype(np.float32)
        yield rng.rand(nt_test, 3, 64, 64, 1).astype(np.float32)  # ragged

    sel = eval_lib.make_select_chunk(cfg, nt_cond, nt_test, 1, 1, metric_names)
    r1, s1, c1, g1 = eval_lib.run_test_device(
        sel, params, state, batches(), nt_cond, nt_test, n_samples, chunk,
        base_key, metric_names, (64, 64, 1), progress=False,
        mesh=None, pad_to=8)
    sel8 = eval_lib.make_select_chunk(cfg, nt_cond, nt_test, 1, 1, metric_names)
    r8, s8, c8, g8 = eval_lib.run_test_device(
        sel8, params, state, batches(), nt_cond, nt_test, n_samples, chunk,
        base_key, metric_names, (64, 64, 1), progress=False,
        mesh=make_mesh(8), pad_to=8)

    for name in metric_names:
        np.testing.assert_allclose(r1[name], r8[name], rtol=1e-5)
    for key in s1:
        np.testing.assert_array_equal(s1[key], s8[key])
    np.testing.assert_array_equal(c1, c8)
    np.testing.assert_array_equal(g1, g8)


def test_ragged_batches_compile_once():
    """pad_to pins the compiled shape: a loader with a ragged remainder must
    trigger exactly ONE jit compile of the selection program (VERDICT r2
    item 7)."""
    cfg, params, state = _tiny_eval_setup()
    nt_cond, nt_test = 2, 5
    metric_names = ["psnr"]

    def batches():
        rng = np.random.RandomState(2)
        yield rng.rand(nt_test, 4, 64, 64, 1).astype(np.float32)
        yield rng.rand(nt_test, 1, 64, 64, 1).astype(np.float32)  # ragged

    sel = eval_lib.make_select_chunk(cfg, nt_cond, nt_test, 1, 1, metric_names)
    r, s, c, g = eval_lib.run_test_device(
        sel, params, state, batches(), nt_cond, nt_test, 2, 2,
        jax.random.PRNGKey(0), metric_names, (64, 64, 1), progress=False,
        pad_to=4)
    assert sel._cache_size() == 1
    assert r["psnr"].shape == (5,)  # 4 + 1 real videos, padding dropped
    assert s["psnr_best"].shape[0] == 5
