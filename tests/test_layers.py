"""Parity tests for BN / MLP / LSTM layers against torch modules."""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from srvp_tpu.models import lstm as lstmlib
from srvp_tpu.models import mlp as mlplib
from srvp_tpu.models.layers import bn_apply, bn_init


class TestBatchNorm:
    def _setup(self, c=6):
        rng = np.random.RandomState(0)
        x = rng.randn(8, c, 5, 5).astype(np.float32)
        scale = rng.randn(c).astype(np.float32) + 1.0
        bias = rng.randn(c).astype(np.float32)
        tbn = nn.BatchNorm2d(c)
        with torch.no_grad():
            tbn.weight.copy_(torch.from_numpy(scale))
            tbn.bias.copy_(torch.from_numpy(bias))
        params, state = bn_init(jax.random.PRNGKey(0), c)
        params = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
        return x, tbn, params, state

    def test_train_mode_matches_torch(self):
        x, tbn, params, state = self._setup()
        tbn.train()
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        ours, new_state = bn_apply(
            params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=True)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5)
        # running stats must match torch's (momentum 0.1, unbiased var)
        np.testing.assert_allclose(
            np.asarray(new_state["mean"]), tbn.running_mean.numpy(), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(new_state["var"]), tbn.running_var.numpy(), rtol=1e-4, atol=1e-6)

    def test_eval_mode_matches_torch(self):
        x, tbn, params, state = self._setup()
        rm = np.random.RandomState(1).randn(6).astype(np.float32) * 0.1
        rv = np.abs(np.random.RandomState(2).randn(6).astype(np.float32)) + 0.5
        with torch.no_grad():
            tbn.running_mean.copy_(torch.from_numpy(rm))
            tbn.running_var.copy_(torch.from_numpy(rv))
        state = {"mean": jnp.asarray(rm), "var": jnp.asarray(rv)}
        tbn.eval()
        ref = tbn(torch.from_numpy(x)).detach().numpy()
        ours, _ = bn_apply(
            params, state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False)
        np.testing.assert_allclose(
            np.transpose(np.asarray(ours), (0, 3, 1, 2)), ref, rtol=1e-4, atol=1e-5)


class TestMLP:
    def test_pre_activation_ordering_matches_torch(self):
        """Reference MLP applies activation BEFORE every linear but the first
        (/root/reference/module/mlp.py:69-73)."""
        n_inp, n_hid, n_out, n_layers = 7, 16, 5, 4
        params = mlplib.mlp_init(jax.random.PRNGKey(0), n_inp, n_hid, n_out, n_layers)
        # Build the same network in torch and copy our weights in.
        dims = mlplib.mlp_dims(n_inp, n_hid, n_out, n_layers)
        tlayers = []
        for il, (d_in, d_out) in enumerate(dims):
            if il > 0:
                tlayers.append(nn.ReLU())
            lin = nn.Linear(d_in, d_out)
            with torch.no_grad():
                lin.weight.copy_(torch.from_numpy(np.asarray(params[il]["kernel"]).T))
                lin.bias.copy_(torch.from_numpy(np.asarray(params[il]["bias"])))
            tlayers.append(lin)
        tmlp = nn.Sequential(*tlayers)
        x = np.random.RandomState(3).randn(9, n_inp).astype(np.float32)
        ref = tmlp(torch.from_numpy(x)).detach().numpy()
        ours = mlplib.mlp_apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)

    def test_default_init_distribution(self):
        # torch Linear default: U(-1/sqrt(fan_in), 1/sqrt(fan_in))
        params = mlplib.mlp_init(jax.random.PRNGKey(1), 100, 200, 10, 2)
        w = np.asarray(params[0]["kernel"])
        bound = 1.0 / np.sqrt(100)
        assert w.min() >= -bound and w.max() <= bound
        assert abs(w.std() - bound / np.sqrt(3)) < 0.005

    def test_orthogonal_init(self):
        params = mlplib.mlp_init(jax.random.PRNGKey(2), 64, 128, 64, 3,
                                 init_type="orthogonal", init_gain=1.41)
        w = np.asarray(params[1]["kernel"])  # (128, 128) square hidden layer
        gram = w.T @ w
        np.testing.assert_allclose(gram, 1.41 ** 2 * np.eye(128), atol=1e-4)
        assert np.all(np.asarray(params[0]["bias"]) == 0)


class TestLSTM:
    def test_matches_torch_lstm(self):
        n_in, n_hid, t, b = 12, 24, 7, 3
        params = lstmlib.lstm_init(jax.random.PRNGKey(0), n_in, n_hid)
        tl = nn.LSTM(n_in, n_hid, 1)
        with torch.no_grad():
            tl.weight_ih_l0.copy_(torch.from_numpy(np.asarray(params["w_ih"]).T))
            tl.weight_hh_l0.copy_(torch.from_numpy(np.asarray(params["w_hh"]).T))
            tl.bias_ih_l0.copy_(torch.from_numpy(np.asarray(params["b_ih"])))
            tl.bias_hh_l0.copy_(torch.from_numpy(np.asarray(params["b_hh"])))
        x = np.random.RandomState(4).randn(t, b, n_in).astype(np.float32)
        ref, _ = tl(torch.from_numpy(x))
        ours = lstmlib.lstm_apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(),
                                   rtol=1e-4, atol=1e-5)


def test_bn_stats_affine_vjp_matches_autodiff(monkeypatch):
    """SRVP_BN_STATS=affine_vjp (closed-form stats backward, one elementwise
    pass in compute dtype — perf experiment for the bf16 BN-backward
    traffic) must produce the same loss and gradients as the autodiff
    default, up to f32 reassociation noise."""
    import os
    import numpy as np
    from srvp_tpu.models import layers

    x = jnp.asarray(np.random.RandomState(0).randn(40, 8, 8, 6)
                    .astype(np.float32))
    params, state = layers.bn_init(jax.random.PRNGKey(0), 6, scale_std=0.02)

    def loss(x):
        y, ns = layers.bn_apply(params, state, x, train=True)
        return (jnp.sum(jnp.sin(y) * y ** 2) + jnp.sum(ns["mean"] ** 2)
                + jnp.sum(ns["var"] ** 2))

    monkeypatch.delenv("SRVP_BN_STATS", raising=False)
    v0, g0 = jax.value_and_grad(loss)(x)
    monkeypatch.setenv("SRVP_BN_STATS", "affine_vjp")
    v1, g1 = jax.value_and_grad(loss)(x)
    assert float(v1) == float(v0)  # forward path is shared code
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-5, atol=1e-5)
