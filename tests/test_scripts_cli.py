"""CLI coverage for the auxiliary scripts and train.py runtime branches.

  * scripts/convert_checkpoint.py — the documented offline path for
    reproducing paper numbers from released .pt checkpoints
    (load_torch_checkpoint itself is golden-tested; this drives the script's
    arg plumbing + .npz write and proves the output loads as a native
    snapshot).
  * train.py --profile_dir — the jax.profiler trace hook
    (srvp_tpu/train_main.py:147-153), SURVEY.md §5 tracing subsystem.
"""

import argparse
import os
import sys

import numpy as np
import pytest
import torch

import jax

from srvp_tpu.helper import DotDict, save_json
from srvp_tpu.models import srvp
from srvp_tpu.utils import checkpoint as ckpt
from tests.torch_ref import TorchSRVP

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


TINY = srvp.SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                       nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                       nlayers_res=2, archi="dcgan")


def test_convert_checkpoint_script_roundtrip(tmp_path):
    import convert_checkpoint

    torch.manual_seed(0)
    tmodel = TorchSRVP(TINY).eval()
    pt_path = tmp_path / "model.pt"
    torch.save(tmodel.state_dict(), pt_path)
    config = dict(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                  nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                  nlayers_res=2, archi="dcgan")
    save_json(config, tmp_path / "config.json")

    out = tmp_path / "model.npz"
    convert_checkpoint.main(argparse.Namespace(
        pt=str(pt_path), config=str(tmp_path / "config.json"), out=str(out)))

    # the produced snapshot must load through the NATIVE checkpoint loader
    tmpl_p, tmpl_s = srvp.init(jax.random.PRNGKey(0), TINY)
    params, bn_state = ckpt.load_model(str(out), tmpl_p, tmpl_s)
    assert jax.tree.structure(params) == jax.tree.structure(tmpl_p)
    # spot-check an actual weight against the torch source (HWIO transpose)
    w_torch = tmodel.state_dict()["q_y.module.0.0.weight"].numpy()
    np.testing.assert_allclose(np.asarray(params["q_y"][0]["kernel"]),
                               w_torch.T, rtol=0, atol=0)


def test_train_profile_dir_writes_trace(tmp_path):
    from srvp_tpu.train_main import main as train_main

    data_dir = tmp_path / "data"
    data_dir.mkdir()
    profile_dir = tmp_path / "trace"
    argv_opt = DotDict(
        save_path=str(tmp_path / "xp"), dataset="smmnist",
        data_dir=str(data_dir), allow_synthetic=True, seed=3,
        nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False, archi="dcgan",
        nt_cond=3, nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
        nlayers_res=2, seq_len=6, seq_len_test=None, batch_size=8,
        batch_size_test=4, n_iter=16, val_interval=16, n_iter_test=1,
        n_samples_test=2, val_samples_chunk=2, log_interval=8, n_workers=1,
        n_euler_steps=1, obs_scale=1.0, beta_y=1.0, beta_z=1.0, l2_res=1.0,
        lr=3e-4, lr_scheduling_burnin=10, lr_scheduling_n_iter=10,
        res_gain=1.41, chkpt_interval=None, ndigits=2, max_speed=4,
        deterministic=False, profile_dir=str(profile_dir))
    assert train_main(argv_opt) == 0

    # the trace hook runs iterations 10-15 and must leave an xplane artifact
    traces = [os.path.join(root, f)
              for root, _, files in os.walk(profile_dir) for f in files]
    assert any(f.endswith(".xplane.pb") for f in traces), traces

    # scripts/xplane_summary.py must parse the real trace (its standalone
    # protobuf wire parser, no tensorflow) and report at least one plane
    import xplane_summary
    main_out = []
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        xplane_summary.main(str(profile_dir))
    main_out = buf.getvalue()
    assert "=== plane:" in main_out, main_out[:500]


class TestBenchPreflight:
    """bench.preflight_device: wedge-tolerant device probe (bench.py)."""

    def _import_bench(self):
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        import bench
        return bench

    def test_unresponsive_device_emits_diagnostic_json(self, monkeypatch, capsys):
        import json as json_mod
        import subprocess
        bench = self._import_bench()

        def hang(*a, **kw):
            raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

        monkeypatch.setattr(subprocess, "run", hang)
        monkeypatch.setattr("time.sleep", lambda s: None)
        assert bench.preflight_device(retries=2, probe_timeout=1, wait=0) is False
        line = [l for l in capsys.readouterr().out.splitlines() if l.strip()][-1]
        rec = json_mod.loads(line)  # one well-formed JSON line for the driver
        assert rec["value"] is None and "device unavailable" in rec["error"]

    def test_responsive_device_passes_silently(self, monkeypatch, capsys):
        import subprocess
        bench = self._import_bench()
        ok = argparse.Namespace(returncode=0, stdout="TPU v5 lite\n", stderr="")
        monkeypatch.setattr(subprocess, "run", lambda *a, **kw: ok)
        assert bench.preflight_device(retries=1) is True
        assert capsys.readouterr().out.strip() == ""


class TestCompilerOptionsEnv:
    """SRVP_COMPILER_OPTIONS -> per-compile PJRT compiler options."""

    def test_unset_returns_none(self, monkeypatch):
        from srvp_tpu.utils.runtime import compiler_options_from_env
        monkeypatch.delenv("SRVP_COMPILER_OPTIONS", raising=False)
        assert compiler_options_from_env() is None

    def test_json_types_preserved(self, monkeypatch):
        # PJRT option parsing is typed: bools/ints must survive as such.
        from srvp_tpu.utils.runtime import compiler_options_from_env
        monkeypatch.setenv(
            "SRVP_COMPILER_OPTIONS",
            '{"xla_tpu_scoped_vmem_limit_kib": 65536, "flag": false,'
            ' "name": "x"}')
        assert compiler_options_from_env() == {
            "xla_tpu_scoped_vmem_limit_kib": 65536, "flag": False,
            "name": "x"}

    def test_non_object_rejected(self, monkeypatch):
        from srvp_tpu.utils.runtime import compiler_options_from_env
        monkeypatch.setenv("SRVP_COMPILER_OPTIONS", '["not", "a", "dict"]')
        with pytest.raises(ValueError, match="JSON object"):
            compiler_options_from_env()

    def test_train_step_builds_with_options(self, monkeypatch):
        # The env hook must not break jit construction/compilation on the
        # CPU backend (harmless generic option).
        import jax.numpy as jnp
        from srvp_tpu import train_lib
        from srvp_tpu.models.srvp import SRVPConfig
        import jax
        monkeypatch.setenv("SRVP_COMPILER_OPTIONS",
                           '{"xla_cpu_enable_fast_math": false}')
        cfg = SRVPConfig(nx=64, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False,
                         nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                         nlayers_res=2, archi="dcgan")
        hp = train_lib.TrainHParams(nt_cond=2)
        ts = train_lib.init_train_state(jax.random.PRNGKey(0), cfg, hp)
        step = train_lib.make_train_step(cfg, hp)
        x = jnp.zeros((4, 2, 64, 64, 1), jnp.float32)
        ts2, metrics = step(ts, x)
        assert jnp.isfinite(metrics["loss"])


class TestSweepXlaFlags:
    """scripts/sweep_xla_flags.py: per-leg isolation + partial persistence."""

    def test_main_persists_partials_and_survives_leg_failure(
            self, monkeypatch, tmp_path, capsys):
        import json as json_mod
        import sweep_xla_flags as sweep
        monkeypatch.setattr(sweep, "OUT", str(tmp_path / "out.json"))
        monkeypatch.setattr(sweep, "LEGS", {
            "baseline": {}, "fast": {"fake_option": "1"},
            "broken": {"bad_option": "x"}})

        def fake_run_leg(name, options, cfg, steps):
            if name == "broken":
                return {"error": "Unknown flag --bad", "rc": 1}
            return {"fps": 100.0, "sec_per_step": 0.1 if name == "baseline"
                    else 0.09, "mfu": 0.5}

        monkeypatch.setattr(sweep, "run_leg", fake_run_leg)
        monkeypatch.setattr(sys, "argv", ["sweep_xla_flags.py", "kth-vgg", "3"])
        sweep.main()
        with open(tmp_path / "out.json") as f:
            out = json_mod.load(f)
        assert out["config"] == "kth-vgg" and out["steps"] == 3
        assert set(out["legs"]) == {"baseline", "fast", "broken"}
        assert out["legs"]["broken"]["error"].startswith("Unknown")
        assert out["legs"]["fast"]["options"] == {"fake_option": "1"}
        text = capsys.readouterr().out
        assert "0.90x baseline" in text  # summary ranks vs baseline


def test_make_synthetic_test_set(tmp_path):
    """scripts/make_synthetic_test_set.py writes a test.py-consumable npz
    (time-major uint8 `sequences`) and different digit seeds give different
    held-out glyph banks."""
    import subprocess
    import sys
    import numpy as np

    REPO = os.path.join(os.path.dirname(__file__), "..")

    def run(seed):
        out = tmp_path / f"s{seed}"
        subprocess.run(
            [sys.executable, "scripts/make_synthetic_test_set.py",
             "--data_dir", str(out), "--n_videos", "3", "--seq_len", "8",
             "--digit_seed", str(seed)],
            check=True, cwd=REPO, env={**os.environ, "JAX_PLATFORMS": "cpu"})
        with np.load(out / "smmnist_test_2digits_64.npz") as arc:
            return arc["sequences"]

    a, b = run(1), run(2)
    assert a.shape == (8, 3, 64, 64) and a.dtype == np.uint8
    assert not np.array_equal(a, b)  # held-out glyph bank differs by seed
