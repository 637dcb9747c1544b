"""Flag-for-flag parity of the training CLI with the reference.

Pins the full reference flag surface (/root/reference/args.py:43-163, names +
types + defaults + required/choices), so refactors of srvp_tpu/args.py cannot
silently drop or change a flag a reference user's launch script relies on.
The manifest is self-contained (no import of the reference tree).
"""

import argparse

import pytest

from srvp_tpu import args as args_mod

# (flag, type, default, required) from /root/reference/args.py. Flags where
# the reference uses store_true carry type=bool, default=False.
REFERENCE_TRAIN_FLAGS = [
    ("seed", int, None, False),
    ("save_path", str, None, True),
    ("torch_amp", bool, False, False),
    ("apex_amp", bool, False, False),
    ("amp_opt_lvl", str, "O1", False),
    ("keep_batchnorm_fp32", bool, None, False),
    ("apex_verbose", bool, False, False),
    ("local_rank", int, 0, False),
    ("n_workers", int, 4, False),
    ("nhx", int, 128, False),
    ("ny", int, None, True),
    ("nz", int, None, True),
    ("n_euler_steps", int, 1, False),
    ("nt_inf", int, None, True),
    ("obs_scale", float, 1, False),
    ("archi", str, "dcgan", False),
    ("skipco", bool, False, False),
    ("nf", int, 64, False),
    ("nh_res", int, 512, False),
    ("nlayers_res", int, 4, False),
    ("nh_inf", int, 256, False),
    ("nlayers_inf", int, 3, False),
    ("res_gain", float, 1.41, False),
    ("beta_y", float, 1, False),
    ("beta_z", float, 1, False),
    ("l2_res", float, 1, False),
    ("batch_size", int, 128, False),
    ("lr", float, 0.0003, False),
    ("lr_scheduling_burnin", int, 1000000, False),
    ("lr_scheduling_n_iter", int, 100000, False),
    ("dataset", str, None, True),
    ("data_dir", str, None, True),
    ("seq_len", int, None, True),
    ("ndigits", int, 2, False),
    ("max_speed", int, 4, False),
    ("deterministic", bool, False, False),
    ("subsampling", int, 8, False),
    ("nx", int, 64, False),
    ("nc", int, None, True),
    ("val_interval", int, 20000, False),
    ("chkpt_interval", int, None, False),
    ("batch_size_test", int, 16, False),
    ("n_iter_test", int, 25, False),
    ("nt_cond", int, None, True),
    ("n_samples_test", int, 100, False),
    ("seq_len_test", int, None, False),
]


def _actions():
    parser = args_mod.create_args()
    return {a.dest: a for a in parser._actions
            if isinstance(a, argparse.Action) and a.dest != "help"}


@pytest.mark.parametrize("flag,ftype,default,required",
                         REFERENCE_TRAIN_FLAGS,
                         ids=[f[0] for f in REFERENCE_TRAIN_FLAGS])
def test_reference_flag_present_with_same_contract(flag, ftype, default,
                                                   required):
    actions = _actions()
    assert flag in actions, f"reference flag --{flag} missing"
    a = actions[flag]
    if ftype is bool:
        # store_true flags: const True, matching default
        assert a.const is True or a.nargs == 0, f"--{flag} not a switch"
        assert a.default == default
    else:
        assert a.type is ftype, f"--{flag} type {a.type} != {ftype}"
        if required:
            # reference requires it; ours must too (or at least not invent a
            # default that changes behavior when omitted)
            assert a.required or a.default is None, (
                f"--{flag} is required in the reference but optional with a "
                f"default here ({a.default})")
        else:
            assert a.default == default, (
                f"--{flag} default {a.default} != reference {default}")


# (flag, type, default) from /root/reference/test.py:331-355. Deliberate
# deviations, documented in test.py's own help text: --lpips_dir is optional
# here (LPIPS skipped when absent — the reference hard-requires its vendored
# weights dir), and --model_name defaults to the native model.npz (a .pt
# value converts on the fly, same flag).
REFERENCE_TEST_FLAGS = [
    ("xp_dir", str, None, True),
    ("data_dir", str, None, True),
    ("lpips_dir", str, None, False),
    ("n_euler_steps", int, None, False),
    ("nt_cond", int, None, False),
    ("nt_gen", int, None, False),
    ("batch_size", int, 16, False),
    ("n_samples", int, 100, False),
    ("model_name", str, "model.npz", False),
    ("device", int, None, False),
    ("fvd", bool, False, False),
    ("test_seed", int, 1, False),
]


@pytest.mark.parametrize("flag,ftype,default,required", REFERENCE_TEST_FLAGS,
                         ids=[f[0] for f in REFERENCE_TEST_FLAGS])
def test_reference_test_cli_flag_present(flag, ftype, default, required):
    import test as test_cli
    actions = {a.dest: a for a in test_cli.create_test_args()._actions
               if a.dest != "help"}
    assert flag in actions, f"reference test.py flag --{flag} missing"
    a = actions[flag]
    if ftype is bool:
        assert a.const is True or a.nargs == 0
        assert a.default == default
    else:
        assert a.type is ftype
        assert a.required == required
        if not required:
            assert a.default == default


def test_reference_choice_sets():
    """ARCH_TYPES / DATASETS / AMP_OPT_LEVELS choice lists
    (/root/reference/args.py:22-26)."""
    actions = _actions()
    assert set(actions["archi"].choices) == {"dcgan", "vgg"}
    assert set(actions["dataset"].choices) == {"smmnist", "kth", "human",
                                              "bair"}
    assert set(actions["amp_opt_lvl"].choices) == {"O0", "O1", "O2", "O3"}
