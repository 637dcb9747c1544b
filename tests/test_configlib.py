"""CLI parser tests: flag parity basics and --config file defaults."""

import json

import pytest

from srvp_tpu import args as args_mod


def test_reference_flag_surface_parses():
    p = args_mod.create_args()
    opt = p.parse_args(
        "--save_path /tmp/x --dataset smmnist --data_dir /tmp/d --ny 20 "
        "--nz 20 --beta_z 2 --nt_cond 5 --nt_inf 5 --nc 1 --seq_len 15".split())
    assert opt.ny == 20 and opt.beta_z == 2.0 and opt.archi == "dcgan"
    assert opt.lr == 0.0003 and opt.batch_size == 128
    assert opt.lr_scheduling_burnin == 1000000


def test_legacy_amp_flags_accepted():
    p = args_mod.create_args()
    opt = p.parse_args(
        "--save_path /tmp/x --dataset kth --data_dir /tmp/d --ny 50 --nz 50 "
        "--nt_cond 10 --nt_inf 3 --nc 1 --seq_len 20 --apex_amp "
        "--amp_opt_lvl O1 --local_rank 0 --device 0 1".split())
    assert opt.apex_amp and opt.device == [0, 1]


def test_torch_and_apex_amp_mutually_exclusive():
    p = args_mod.create_args()
    with pytest.raises(SystemExit):
        p.parse_args(
            "--save_path /tmp/x --dataset smmnist --data_dir /tmp/d --ny 2 "
            "--nz 2 --nt_cond 2 --nt_inf 2 --nc 1 --seq_len 4 "
            "--torch_amp --apex_amp".split())


def test_config_file_defaults_and_cli_override(tmp_path):
    cfg = dict(save_path="/tmp/x", dataset="smmnist", data_dir="/tmp/d",
               ny=20, nz=20, nt_cond=5, nt_inf=5, nc=1, seq_len=15, lr=1e-4)
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps(cfg))
    p = args_mod.create_args()
    opt = p.parse_args(["--config", str(path)])
    assert opt.ny == 20 and opt.lr == 1e-4
    # CLI overrides the file
    p2 = args_mod.create_args()
    opt2 = p2.parse_args(["--config", str(path), "--lr", "0.01"])
    assert opt2.lr == 0.01


def test_config_file_unknown_key_rejected(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({"not_a_flag": 1}))
    p = args_mod.create_args()
    with pytest.raises(SystemExit):
        p.parse_args(["--config", str(path)])


BASE = dict(save_path="/tmp/x", dataset="smmnist", data_dir="/tmp/d",
            ny=20, nz=20, nt_cond=5, nt_inf=5, nc=1, seq_len=15)


@pytest.mark.parametrize("bad", [
    {"dataset": "mnist"},       # not in DATASETS
    {"archi": "vggg"},          # not in ARCH_TYPES
    {"amp_opt_lvl": "O9"},      # not in O0..O3
])
def test_config_file_values_validated_against_choices(tmp_path, bad):
    """File-sourced values get the same choices validation as CLI values
    (configargparse semantics); a typo'd dataset must die in the parser,
    not as a KeyError deep in load_dataset."""
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({**BASE, **bad}))
    with pytest.raises(SystemExit):
        args_mod.create_args().parse_args(["--config", str(path)])


def test_config_file_bool_rejected_for_typed_flags(tmp_path):
    """YAML/JSON `lr: true` must not silently become lr == 1.0."""
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({**BASE, "lr": True}))
    with pytest.raises(SystemExit):
        args_mod.create_args().parse_args(["--config", str(path)])


def test_config_file_mutually_exclusive_flags_rejected(tmp_path):
    path = tmp_path / "bad.json"
    path.write_text(json.dumps({**BASE, "torch_amp": True, "apex_amp": True}))
    with pytest.raises(SystemExit):
        args_mod.create_args().parse_args(["--config", str(path)])
    # one of them (plus the other as False, as saved config.json files have)
    path2 = tmp_path / "ok.json"
    path2.write_text(json.dumps({**BASE, "torch_amp": True, "apex_amp": False}))
    opt = args_mod.create_args().parse_args(["--config", str(path2)])
    assert opt.torch_amp and not opt.apex_amp


def test_config_file_bools_still_work_for_flag_actions(tmp_path):
    path = tmp_path / "ok.json"
    path.write_text(json.dumps({**BASE, "skipco": True, "apex_amp": False}))
    opt = args_mod.create_args().parse_args(["--config", str(path)])
    assert opt.skipco is True and opt.apex_amp is False
