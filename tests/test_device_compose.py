"""On-device compositing parity with host generation."""

import numpy as np

import jax.numpy as jnp

from srvp_tpu.data.device_compose import composite_mmnist, materialize, parts_collate
from srvp_tpu.data.mmnist import MovingMNIST, synthetic_digits


def test_composite_bit_parity_with_get_item():
    digits = synthetic_digits(11, np.random.RandomState(0))
    ds = MovingMNIST(digits, 64, 9, 4, False, 2, True)
    items, parts = [], []
    for seed in [3, 77, 1234]:
        items.append(ds.get_item(0, np.random.RandomState(seed)))
        parts.append(ds.get_item_parts(0, np.random.RandomState(seed)))
    batch = parts_collate(parts)
    video = composite_mmnist(jnp.asarray(batch["digits"]),
                             jnp.asarray(batch["pos"]))
    assert video.shape == (9, 3, 64, 64, 1)
    for i, ref in enumerate(items):
        np.testing.assert_array_equal(np.asarray(video[:, i, :, :, 0]), ref)


def test_materialize_paths():
    digits = synthetic_digits(5, np.random.RandomState(1))
    ds = MovingMNIST(digits, 64, 4, 4, True, 1, True)
    parts = parts_collate([ds.get_item_parts(0, np.random.RandomState(9))])
    x = materialize({k: jnp.asarray(v) for k, v in parts.items()})
    assert x.shape == (4, 1, 64, 64, 1) and x.dtype == jnp.float32
    assert 0.0 <= float(x.min()) and float(x.max()) <= 1.0
    # dense uint8 path
    u8 = jnp.asarray(ds.get_item(0, np.random.RandomState(9))[:, None, :, :, None])
    x2 = materialize(u8)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2))


def test_train_step_with_parts_batch():
    import jax
    from srvp_tpu import train_lib
    from srvp_tpu.models.srvp import SRVPConfig
    cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                     nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                     nlayers_res=2, archi="dcgan")
    hp = train_lib.TrainHParams(nt_cond=2)
    ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    step = train_lib.make_train_step(cfg, hp)
    digits = synthetic_digits(5, np.random.RandomState(2))
    ds = MovingMNIST(digits, 64, 4, 4, False, 2, True)
    parts = parts_collate([ds.get_item_parts(0, np.random.RandomState(s))
                           for s in range(8)])
    batch = {k: jnp.asarray(v) for k, v in parts.items()}
    ts, m1 = step(ts, batch)
    # equivalent dense batch gives the same loss (same params/state/rng path)
    dense = np.stack([ds.get_item(0, np.random.RandomState(s))
                      for s in range(8)], axis=1)[..., None]
    ts2 = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
    step2 = train_lib.make_train_step(cfg, hp)
    ts2, m2 = step2(ts2, jnp.asarray(dense))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
