"""Custom-VJP fused training rollout vs lax.scan autodiff (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from srvp_tpu.models import mlp as mlplib
from srvp_tpu.ops import init as winit
from srvp_tpu.ops.pallas.rollout_train import make_train_rollout


def _scan_reference(q_params, pz_params, dyn_params, y_0, hxz, eps, o):
    """Reference semantics via plain jnp ops (autodiff-able)."""
    dt = 1.0 / o
    K = eps.shape[0]

    def linear(p, x):
        return x @ p["kernel"] + p["bias"]

    ys, res, qs, ps, zs = [], [], [], [], []
    y, z = y_0, jnp.zeros_like(eps[0])
    for k in range(K):
        q_par = linear(q_params, hxz[k])
        loc, raw = jnp.split(q_par, 2, -1)
        z_new = loc + eps[k] * (jax.nn.softplus(raw) + 1e-8)
        z = z_new if k % o == 0 else z
        p_par = mlplib.mlp_apply(pz_params, y)
        r = dt * mlplib.mlp_apply(dyn_params, jnp.concatenate([y, z], -1))
        y = y + r
        ys.append(y); res.append(r); qs.append(q_par); ps.append(p_par); zs.append(z)
    return tuple(jnp.stack(v) for v in (ys, res, qs, ps, zs))


@pytest.mark.parametrize("o,nt,ny,nz,bsz", [
    (1, 6, 20, 20, 5),
    (2, 4, 12, 20, 9),
])
def test_fused_train_rollout_fwd_and_grads(o, nt, ny, nz, bsz):
    nh_inf, nh_res, nlayers = 24, 64, 3
    K = o * (nt - 1)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 6)
    q_params = winit.linear_default(ks[0], nh_inf, 2 * nz)
    pz_params = mlplib.mlp_init(ks[1], ny, nh_res, 2 * nz, nlayers)
    dyn_params = mlplib.mlp_init(ks[2], ny + nz, nh_res, ny, nlayers,
                                 init_type="orthogonal", init_gain=1.2)
    y_0 = 0.1 * jax.random.normal(ks[3], (bsz, ny))
    hxz = jax.random.normal(ks[4], (K, bsz, nh_inf))
    eps = jax.random.normal(ks[5], (K, bsz, nz))

    fused = make_train_rollout(ny, nz, nh_inf, nh_res, K, o, interpret=True)

    out_f = fused(q_params, pz_params, dyn_params, y_0, hxz, eps)
    out_r = _scan_reference(q_params, pz_params, dyn_params, y_0, hxz, eps, o)
    for a, b, name in zip(out_f, out_r, ["ys", "res", "q", "p", "z"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-6, err_msg=name)

    # gradient parity on a loss touching every output
    def loss(fn):
        def inner(q, pz, dyn, y0, hx):
            ys, res, qp, pp, zs = fn(q, pz, dyn, y0, hx, eps)
            return (jnp.sum(ys * 0.3) + jnp.sum(res ** 2)
                    + jnp.sum(jnp.tanh(qp)) + jnp.sum(pp * 0.1)
                    + jnp.sum(zs * 0.05))
        return inner

    args = (q_params, pz_params, dyn_params, y_0, hxz)
    g_f = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(*args)
    g_r = jax.grad(loss(lambda *a: _scan_reference(*a, o)),
                   argnums=(0, 1, 2, 3, 4))(*args)
    for tf, tr, name in zip(g_f, g_r, ["q", "pz", "dyn", "y0", "hxz"]):
        for lf, lr in zip(jax.tree_util.tree_leaves(tf),
                          jax.tree_util.tree_leaves(tr)):
            np.testing.assert_allclose(np.asarray(lf), np.asarray(lr),
                                       rtol=5e-4, atol=5e-6, err_msg=name)


def test_model_level_fused_matches_scan():
    """srvp.forward with fused_rollout must reproduce the scan forward AND
    its gradients for the same rng (shared key schedule)."""
    from srvp_tpu.models import srvp
    from srvp_tpu.models.srvp import SRVPConfig
    from srvp_tpu.objectives import elbo_loss

    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=3, archi="dcgan")
    params, state = srvp.init(jax.random.PRNGKey(0), cfg, res_gain=1.2)
    x = jnp.asarray(np.random.RandomState(1).rand(5, 4, 64, 64, 1)
                    .astype(np.float32))
    rng = jax.random.PRNGKey(7)

    def loss(params, fused):
        l, aux = elbo_loss(cfg, params, state, x, rng, oversampling=2,
                           obs_scale=1.0, beta_y=1.0, beta_z=2.0, l2_res=1.0,
                           fused_rollout=fused)
        return l

    import srvp_tpu.models.srvp as srvp_mod
    # route the fused branch through interpreter mode for CPU
    orig_fwd = srvp_mod.forward
    l_scan, g_scan = jax.value_and_grad(lambda p: loss(p, False))(params)

    def fwd_interp(*a, **k):
        if k.get("fused_rollout"):
            k["fused_interpret"] = True
        return orig_fwd(*a, **k)

    srvp_mod.forward = fwd_interp
    try:
        l_fused, g_fused = jax.value_and_grad(lambda p: loss(p, True))(params)
    finally:
        srvp_mod.forward = orig_fwd

    np.testing.assert_allclose(float(l_fused), float(l_scan), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_scan),
                    jax.tree_util.tree_leaves(g_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-3, atol=2e-5)
