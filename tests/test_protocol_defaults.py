"""Evaluation-protocol default regression tests.

Reference semantics: test.py defaults nt_gen to 25
(/root/reference/test.py:337-338); configs may also carry seq_len_test.
"""

import test as test_cli

from srvp_tpu.helper import DotDict


def test_nt_gen_cli_wins():
    opt = DotDict(nt_gen=40)
    cfg = DotDict(seq_len_test=30)
    assert test_cli.resolve_nt_test(opt, cfg) == 40


def test_nt_gen_falls_back_to_config():
    opt = DotDict(nt_gen=None)
    cfg = DotDict(seq_len_test=30)
    assert test_cli.resolve_nt_test(opt, cfg) == 30


def test_nt_gen_defaults_to_25_when_config_silent():
    opt = DotDict(nt_gen=None)
    cfg = DotDict()  # config.json without seq_len_test
    assert test_cli.resolve_nt_test(opt, cfg) == 25


def test_nt_gen_defaults_to_25_when_config_none():
    opt = DotDict(nt_gen=None)
    cfg = DotDict(seq_len_test=None)
    assert test_cli.resolve_nt_test(opt, cfg) == 25
