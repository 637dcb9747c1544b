"""The shipped configs/*.yaml reproduce the reference README training recipes.

The reference publishes its five training configurations only as CLI option
blocks (/root/reference/README.md "Training" section); srvp-tpu ships them as
ready-made config files for the `--config` shim. This pins each file against
a self-contained manifest of that README section so edits cannot drift from
the published recipes, and parses each through the real training parser so
the YAML path (including store_true booleans) is exercised end to end.
"""

import os

import pytest

from srvp_tpu import args as args_mod
from srvp_tpu.helper import DotDict

CONFIGS_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")

# Option blocks from /root/reference/README.md "Training" section, verbatim.
RECIPES = {
    "smmnist-stochastic.yaml": dict(
        dataset="smmnist", nc=1, seq_len=15, ny=20, nz=20, beta_z=2.0,
        nt_cond=5, nt_inf=5),
    "smmnist-deterministic.yaml": dict(
        dataset="smmnist", deterministic=True, nc=1, seq_len=15, ny=20,
        nz=20, beta_z=2.0, nt_cond=5, nt_inf=5, lr_scheduling_burnin=800000,
        lr_scheduling_n_iter=100000),
    "kth.yaml": dict(
        dataset="kth", nc=1, seq_len=20, seq_len_test=30, ny=50, nz=50,
        n_euler_steps=2, res_gain=1.2, archi="vgg", skipco=True, nt_cond=10,
        nt_inf=3, obs_scale=0.2, batch_size=100,
        lr_scheduling_burnin=150000, lr_scheduling_n_iter=50000,
        val_interval=5000),
    "human.yaml": dict(
        dataset="human", nc=3, seq_len=16, seq_len_test=53, ny=50, nz=50,
        n_euler_steps=2, res_gain=1.2, archi="vgg", skipco=True, nt_cond=8,
        nt_inf=3, obs_scale=0.2, batch_size=100, batch_size_test=8,
        lr_scheduling_burnin=325000, lr_scheduling_n_iter=25000,
        val_interval=20000),
    "bair.yaml": dict(
        dataset="bair", nc=3, seq_len=12, ny=50, nz=50, n_euler_steps=2,
        archi="vgg", skipco=True, nt_cond=2, nt_inf=2, obs_scale=0.71,
        batch_size=192, lr_scheduling_burnin=1000000,
        lr_scheduling_n_iter=500000),
}


def _parse_with_config(path):
    p = args_mod.create_args()
    return DotDict(vars(p.parse_args(
        ["--config", path, "--data_dir", "/tmp/d", "--save_path", "/tmp/s"])))


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_config_matches_reference_recipe(name):
    path = os.path.join(CONFIGS_DIR, name)
    assert os.path.exists(path), f"missing shipped config {name}"
    opt = _parse_with_config(path)
    for key, want in RECIPES[name].items():
        got = opt[key]
        assert got == want and type(got) is type(want), (
            f"{name}: {key} = {got!r} ({type(got).__name__}), reference "
            f"recipe says {want!r}")


@pytest.mark.parametrize("name", sorted(RECIPES))
def test_config_contains_no_extra_recipe_keys(name):
    """Shipped files must not silently override defaults the reference
    recipe leaves untouched (data/save paths stay CLI-provided)."""
    import yaml
    with open(os.path.join(CONFIGS_DIR, name)) as f:
        values = yaml.safe_load(f)
    extra = set(values) - set(RECIPES[name])
    assert not extra, f"{name} sets keys beyond the reference recipe: {extra}"


def test_config_values_pass_through_type_converters(tmp_path):
    """File-sourced values go through each flag's type converter, like
    configargparse: scientific-notation strings become floats, ints become
    floats for float-typed flags."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text("lr: '3e-4'\nbeta_z: 2\n")
    p = args_mod.create_args()
    opt = DotDict(vars(p.parse_args(
        ["--config", str(cfg), "--data_dir", "/d", "--save_path", "/s",
         "--dataset", "smmnist", "--nc", "1", "--seq_len", "15",
         "--ny", "20", "--nz", "20", "--nt_inf", "5", "--nt_cond", "5"])))
    assert opt.lr == 3e-4 and type(opt.lr) is float
    assert opt.beta_z == 2.0 and type(opt.beta_z) is float


def test_cli_overrides_config_file():
    opt = _parse_with_config(os.path.join(CONFIGS_DIR, "kth.yaml"))
    assert opt.batch_size == 100
    p = args_mod.create_args()
    opt2 = DotDict(vars(p.parse_args(
        ["--config", os.path.join(CONFIGS_DIR, "kth.yaml"),
         "--data_dir", "/tmp/d", "--save_path", "/tmp/s",
         "--batch_size", "25"])))
    assert opt2.batch_size == 25  # CLI beats file, like configargparse
