"""Full-model golden tests: srvp_tpu forward vs a torch mirror of the
reference architecture, with shared reparameterization noise and weights
round-tripped through the torch-checkpoint converter."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from srvp_tpu.models import srvp
from srvp_tpu.utils.torch_convert import convert_state_dict
from tests.torch_ref import TorchSRVP

ATOL = 2e-4


def make_cfg(archi="dcgan", skipco=False):
    # Small dims to keep CPU tests fast; 64x64 frames (architectural constant).
    return srvp.SRVPConfig(nx=64, nc=1, nf=8, nhx=16, ny=6, nz=4,
                           skipco=skipco, nt_inf=3, nh_inf=12, nlayers_inf=2,
                           nh_res=24, nlayers_res=3, archi=archi)


def shared_noise(rng, n_steps, bsz, ny, nz):
    """Reproduces the key-split structure of srvp.forward/generate so the
    torch mirror consumes identical epsilon noise."""
    k_skip, k_w, k_y, k_gen = jax.random.split(rng, 4)
    eps_y = jax.random.normal(k_y, (bsz, ny))
    keys = jax.random.split(k_gen, n_steps)
    eps_pri, eps_pos = [], []
    for k in range(n_steps):
        k_pri, k_pos = jax.random.split(keys[k])
        eps_pri.append(jax.random.normal(k_pri, (bsz, nz)))
        eps_pos.append(jax.random.normal(k_pos, (bsz, nz)))
    to_t = lambda a: torch.from_numpy(np.asarray(a))
    return (to_t(eps_y), [to_t(e) for e in eps_pri], [to_t(e) for e in eps_pos])


@pytest.mark.parametrize("archi,skipco,o", [
    ("dcgan", False, 1),
    ("vgg", True, 2),
])
def test_forward_eval_parity(archi, skipco, o):
    cfg = make_cfg(archi, skipco)
    torch.manual_seed(0)
    tmodel = TorchSRVP(cfg).eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    params, state = convert_state_dict(sd, cfg)

    t_cond, bsz, nt = 5, 2, 8  # nt > t_cond: exercises posterior AND prior z
    rng_x = np.random.RandomState(7)
    x = rng_x.rand(t_cond, bsz, 64, 64, cfg.nc).astype(np.float32)

    key = jax.random.PRNGKey(42)
    out = srvp.forward(cfg, params, state, jnp.asarray(x), nt,
                       oversampling=o, rng=key, train=False)

    n_steps = o * (nt - 1)
    eps_y, eps_pri, eps_pos = shared_noise(key, n_steps, bsz, cfg.ny, cfg.nz)
    x_t = torch.from_numpy(np.transpose(x, (0, 1, 4, 2, 3)))
    with torch.no_grad():
        tx, ty, tz, tw, tqy, tqp, tpp, tres = tmodel.forward_eval(
            x_t, nt, o, eps_y, eps_pri, eps_pos)

    np.testing.assert_allclose(np.asarray(out.w), tw.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.q_y_0_params), tqy.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.y), ty.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.z), tz.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.q_z_params), tqp.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.p_z_params), tpp.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(out.res), tres.numpy(), atol=ATOL)
    np.testing.assert_allclose(
        np.transpose(np.asarray(out.x_), (0, 1, 4, 2, 3)), tx.numpy(), atol=ATOL)


def test_generate_pure_prior_parity():
    """Reference test.py:244 rollout mode: generate(y_0, [], nt)."""
    cfg = make_cfg()
    torch.manual_seed(1)
    tmodel = TorchSRVP(cfg).eval()
    params, _ = convert_state_dict(
        {k: v.numpy() for k, v in tmodel.state_dict().items()}, cfg)

    bsz, nt, o = 3, 6, 2
    y_0 = np.random.RandomState(0).randn(bsz, cfg.ny).astype(np.float32)
    key = jax.random.PRNGKey(5)
    gen = srvp.generate(cfg, params, jnp.asarray(y_0), None, nt,
                        oversampling=o, rng=key, train=False)
    assert gen.q_z_params is None

    n_steps = o * (nt - 1)
    keys = jax.random.split(key, n_steps)
    eps_pri = [torch.from_numpy(np.asarray(
        jax.random.normal(jax.random.split(keys[k])[0], (bsz, cfg.nz))))
        for k in range(n_steps)]
    with torch.no_grad():
        ty, tz, tqp, tpp, tres = tmodel.generate(
            torch.from_numpy(y_0), None, nt, o, eps_pri, None)
    assert tqp is None
    np.testing.assert_allclose(np.asarray(gen.y), ty.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(gen.z), tz.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(gen.p_z_params), tpp.numpy(), atol=ATOL)
    np.testing.assert_allclose(np.asarray(gen.res), tres.numpy(), atol=ATOL)
    # y has nt states; res covers every substep
    assert gen.y.shape == (nt, bsz, cfg.ny)
    assert gen.res.shape == (n_steps, bsz, cfg.ny)


def test_forward_train_mode_shapes_and_determinism():
    cfg = make_cfg("dcgan", skipco=True)
    key = jax.random.PRNGKey(0)
    params, state = srvp.init(key, cfg, res_gain=1.41)
    nt, bsz = 6, 4
    x = jnp.asarray(np.random.RandomState(3).rand(nt, bsz, 64, 64, 1)
                    .astype(np.float32))
    out = srvp.forward(cfg, params, state, x, nt, oversampling=1,
                       rng=jax.random.PRNGKey(9), train=True)
    assert out.x_.shape == (nt, bsz, 64, 64, 1)
    assert out.q_z_params.shape == (nt - 1, bsz, 2 * cfg.nz)
    assert out.p_z_params.shape == (nt - 1, bsz, 2 * cfg.nz)
    assert out.res.shape == (nt - 1, bsz, cfg.ny)
    # same key -> identical output; different key -> different (stochastic)
    out2 = srvp.forward(cfg, params, state, x, nt, oversampling=1,
                        rng=jax.random.PRNGKey(9), train=True)
    np.testing.assert_array_equal(np.asarray(out.x_), np.asarray(out2.x_))
    out3 = srvp.forward(cfg, params, state, x, nt, oversampling=1,
                        rng=jax.random.PRNGKey(10), train=True)
    assert np.abs(np.asarray(out.x_) - np.asarray(out3.x_)).max() > 1e-6


def test_infer_w_permutation_invariance_and_subset():
    """Training-mode w must use nt_inf distinct random frames per example."""
    cfg = make_cfg()
    params, _ = srvp.init(jax.random.PRNGKey(0), cfg)
    nt, bsz = 7, 64
    hx = jnp.asarray(np.random.RandomState(1).randn(nt, bsz, cfg.nhx)
                     .astype(np.float32))
    w1 = srvp.infer_w(cfg, params, hx, train=True, rng=jax.random.PRNGKey(1))
    w2 = srvp.infer_w(cfg, params, hx, train=True, rng=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(w1) - np.asarray(w2)).max() > 1e-6
    # eval mode: last nt_inf frames, deterministic
    we1 = srvp.infer_w(cfg, params, hx, train=False)
    we2 = srvp.infer_w(cfg, params, jnp.concatenate(
        [jnp.zeros_like(hx[:1]), hx[1:]], 0), train=False)
    np.testing.assert_array_equal(np.asarray(we1), np.asarray(we2))
