"""End-to-end ELBO + gradient golden parity vs the torch mirror.

Validates the full training computation graph — encoder/decoder with
train-mode batch norm, latent rollout, reparameterized KLs, residual L2 —
by comparing loss values AND parameter gradients between srvp_tpu and a
torch mirror of the reference semantics with shared weights and noise.
"""

import numpy as np

import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from srvp_tpu.models import srvp
from srvp_tpu.utils.torch_convert import convert_state_dict
from tests.torch_ref import TorchSRVP
from tests.test_model_parity import make_cfg, shared_noise


def _torch_elbo(tmodel, x, nt, eps_y, eps_pos, obs_scale, beta_y, beta_z,
                l2_res):
    """Reference ELBO (train.py:91-106) on the torch mirror, train-mode BN,
    posterior z everywhere, skips from the LAST frame (eval-style skip choice
    keeps torch/jax in sync without sharing the frame-index RNG)."""
    bsz = x.shape[1]
    hx, skips = tmodel.encode_eval(x)
    w = tmodel.infer_w_eval(hx)
    y_0, q_y_0 = tmodel.infer_y(hx[: tmodel.cfg.nt_inf], eps_y)
    y, z, qp, pp, res = tmodel.generate(y_0, hx, nt, 1, None, eps_pos)
    x_ = tmodel.decode(w, y, skips)

    nll = (0.5 * ((x - x_) / obs_scale) ** 2 + np.log(obs_scale)
           + 0.5 * np.log(2 * np.pi)).sum()
    loc_q, raw_q = torch.chunk(q_y_0, 2, -1)
    scale_q = F.softplus(raw_q) + 1e-8
    kl_y = (0.5 * (scale_q ** 2 + loc_q ** 2 - 1) - torch.log(scale_q)).sum()
    ql, qr = torch.chunk(qp, 2, -1)
    pl_, pr = torch.chunk(pp, 2, -1)
    qs, ps = F.softplus(qr) + 1e-8, F.softplus(pr) + 1e-8
    kl_z = (torch.log(ps / qs) + (qs ** 2 + (ql - pl_) ** 2) / (2 * ps ** 2)
            - 0.5).sum()
    loss = nll + beta_y * kl_y + beta_z * kl_z
    loss = loss + l2_res * torch.norm(res, p=2, dim=2).sum()
    return loss / bsz


def test_elbo_and_grads_match_torch():
    cfg = make_cfg("dcgan", skipco=False)
    torch.manual_seed(3)
    tmodel = TorchSRVP(cfg).train()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params, state = convert_state_dict(sd, cfg)

    nt, bsz = 5, 4
    x_np = np.random.RandomState(0).rand(nt, bsz, 64, 64, 1).astype(np.float32)
    obs_scale, beta_y, beta_z, l2_res = 0.71, 1.0, 2.0, 1.0

    key = jax.random.PRNGKey(11)

    # --- JAX side: eval-style deterministic choices but TRAIN-mode BN.
    # Use the model pieces directly so torch and jax share eps exactly.
    def loss_fn(params):
        from srvp_tpu.ops import dists
        k_skip, k_w, k_y, k_gen = jax.random.split(key, 4)
        # train-mode BN; skipco=False so the random-skip-frame path is moot
        hx_t, _, _ = srvp.encode(cfg, params, state, jnp.asarray(x_np),
                                 train=True, rng=k_skip)
        w = srvp.infer_w(cfg, params, hx_t.astype(jnp.float32), train=False)
        y_0, q_y_0 = srvp.infer_y(cfg, params,
                                  hx_t.astype(jnp.float32)[: cfg.nt_inf], k_y)
        gen = srvp.generate(cfg, params, y_0, hx_t.astype(jnp.float32), nt,
                            oversampling=1, rng=k_gen, train=True)
        x_, _ = srvp.decode(cfg, params, state, w, gen.y, None, train=True)
        nll = dists.neg_logprob(x_, jnp.asarray(x_np), obs_scale).sum()
        kl_y = dists.kl_raw_vs_std_normal(q_y_0).sum()
        kl_z = dists.kl_raw_vs_raw(gen.q_z_params, gen.p_z_params).sum()
        l2 = jnp.linalg.norm(gen.res, axis=2).sum()
        return (nll + beta_y * kl_y + beta_z * kl_z + l2_res * l2) / bsz

    loss_jax, grads = jax.value_and_grad(loss_fn)(params)

    # --- torch side with identical eps
    n_steps = nt - 1
    eps_y, eps_pri, eps_pos = shared_noise(key, n_steps, bsz, cfg.ny, cfg.nz)
    x_t = torch.from_numpy(np.transpose(x_np, (0, 1, 4, 2, 3))).contiguous()
    loss_t = _torch_elbo(tmodel, x_t, nt, eps_y, eps_pos, obs_scale, beta_y,
                         beta_z, l2_res)
    loss_t.backward()

    assert float(loss_jax) == __import__("pytest").approx(float(loss_t), rel=2e-4)

    def tgrad(name):
        return dict(tmodel.named_parameters())[name].grad.numpy()

    # dynamics MLP first layer (kernel transposed torch->jax)
    np.testing.assert_allclose(
        np.asarray(grads["dynamics"][0]["kernel"]),
        tgrad("dynamics.module.0.0.weight").T, rtol=5e-3, atol=5e-5)
    # q_z head
    np.testing.assert_allclose(
        np.asarray(grads["q_z"]["kernel"]),
        tgrad("q_z.weight").T, rtol=5e-3, atol=5e-5)
    # deepest encoder conv (through train-mode BN backward)
    np.testing.assert_allclose(
        np.asarray(grads["encoder"]["stages"][3][0]["conv"]["kernel"]),
        tgrad("encoder.conv.3.0.weight").transpose(2, 3, 1, 0),
        rtol=5e-3, atol=5e-5)
    # first decoder convT (our storage is pre-flipped HWIO)
    np.testing.assert_allclose(
        np.asarray(grads["decoder"]["first"][0]["conv"]["kernel"]),
        tgrad("decoder.first_upconv.0.weight")
        .transpose(2, 3, 0, 1)[::-1, ::-1], rtol=5e-3, atol=5e-5)
    # BN scale gradient (train-mode batch statistics backward)
    np.testing.assert_allclose(
        np.asarray(grads["encoder"]["stages"][1][0]["bn"]["scale"]),
        tgrad("encoder.conv.1.1.weight"), rtol=5e-3, atol=5e-5)
