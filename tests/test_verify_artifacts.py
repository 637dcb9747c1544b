"""Offline-artifact drop contract (scripts/verify_artifacts.py).

A mirror-generated fake drop — the same formats the real artifacts will
arrive in (/root/reference/metrics/lpips/dist_model.py:57-67,
/root/reference/metrics/fvd/fvd.py:89-126, /root/reference/README.md:15-18)
— must pass verification, and corrupted variants must be rejected, so that
a future real drop is validated by code that has itself been tested.
"""

import gzip
import json
import struct
import subprocess
import sys

import jax
import numpy as np
import pytest
import torch

from scripts.convert_i3d import expected_variable_specs
from scripts.verify_artifacts import verify_drop
from srvp_tpu.models import srvp
from srvp_tpu.models.srvp import SRVPConfig
from srvp_tpu.utils.torch_export import export_state_dict

TINY = dict(nx=16, nc=1, nf=4, nhx=8, ny=4, nz=4, skipco=False, nt_inf=2,
            nh_inf=8, nlayers_inf=2, nh_res=8, nlayers_res=2, archi="dcgan")


def _save_pt(path, sd):
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               path)


@pytest.fixture(scope="module")
def drop(tmp_path_factory):
    """A complete fake drop in the exact on-disk formats of the real one."""
    root = tmp_path_factory.mktemp("drop")
    rng = np.random.RandomState(0)

    # LPIPS v0.1 linear heads at the official nested path
    lp = root / "lpips" / "weights" / "v0.1"
    lp.mkdir(parents=True)
    _save_pt(lp / "alex.pth",
             {f"lin{i}.model.1.weight": rng.rand(1, c, 1, 1).astype("f")
              for i, c in enumerate((64, 192, 384, 256, 256))})
    # torchvision alexnet backbone (download filename)
    bb = {}
    for i, (o, c, k, _) in {0: (64, 3, 11, 0), 3: (192, 64, 5, 0),
                            6: (384, 192, 3, 0), 8: (256, 384, 3, 0),
                            10: (256, 256, 3, 0)}.items():
        bb[f"features.{i}.weight"] = rng.rand(o, c, k, k).astype("f")
        bb[f"features.{i}.bias"] = rng.rand(o).astype("f")
    _save_pt(root / "lpips" / "alexnet-owt-7be5be79.pth", bb)

    # I3D npz with the full kinetics-400 variable inventory
    (root / "i3d").mkdir()
    np.savez(root / "i3d" / "i3d_kinetics400.npz",
             **{p: np.zeros(s, np.float32)
                for p, s in expected_variable_specs()})

    # MNIST idx files (gz, official header layout)
    (root / "mnist").mkdir()
    with gzip.open(root / "mnist" / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 3, 28, 28))
        f.write(bytes(3 * 28 * 28))

    # a released checkpoint: our exporter writes the reference .pt format
    cfg = SRVPConfig(**TINY)
    params, state = srvp.init(jax.random.PRNGKey(0), cfg)
    ck = root / "checkpoints" / "smmnist"
    ck.mkdir(parents=True)
    _save_pt(ck / "model.pt", export_state_dict(params, state, cfg))
    (ck / "config.json").write_text(json.dumps(TINY))

    # official test-set npzs
    ds = root / "datasets"
    ds.mkdir()
    np.savez(ds / "smmnist_test_2digits_64.npz",
             sequences=rng.randint(0, 255, (25, 6, 64, 64), dtype=np.uint8))
    np.savez(ds / "svg_test_set_40.npz",
             sequences=rng.randint(0, 255, (6, 40, 64, 64, 1),
                                   dtype=np.uint8))
    hd = ds / "human" / "test_set_53_8"
    hd.mkdir(parents=True)
    np.savez(hd / "vid0.npz",
             image=rng.randint(0, 255, (417, 64, 64, 3), dtype=np.uint8))
    for v in range(2):
        bd = ds / "bair" / "processed_data" / "test" / "traj_0" / str(v)
        bd.mkdir(parents=True)
        from PIL import Image
        for t in range(30):
            Image.fromarray(rng.randint(0, 255, (8, 8, 3), dtype=np.uint8)
                            ).save(bd / f"{t:02d}.png")
    return root


def test_valid_drop_passes(drop):
    results, ok = verify_drop(str(drop))
    bad = [r for r in results if r["status"] != "ok"]
    assert ok, f"valid drop rejected: {bad}"
    names = {r["artifact"] for r in results}
    assert {"lpips-linear-heads", "alexnet-backbone", "i3d-kinetics400",
            "mnist-idx", "checkpoint:smmnist", "smmnist-test-set",
            "kth-test-set", "human-test-set", "bair-test-set"} <= names


def test_cli_exit_codes(drop, tmp_path):
    manifest = tmp_path / "manifest.json"
    proc = subprocess.run(
        [sys.executable, "scripts/verify_artifacts.py", "--drop", str(drop),
         "--manifest", str(manifest)],
        capture_output=True, text=True)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    m = json.loads(manifest.read_text())
    assert m["ok"] and len(m["artifacts"]) >= 9
    assert all("sha256" in r for r in m["artifacts"]
               if not r["artifact"].startswith(("checkpoint", "human",
                                                "bair")))


def test_corrupt_lpips_rejected(drop, tmp_path):
    bad = tmp_path / "bad"
    (bad / "lpips").mkdir(parents=True)
    rng = np.random.RandomState(1)
    # wrong channel count on lin2
    _save_pt(bad / "lpips" / "alex.pth",
             {f"lin{i}.model.1.weight": rng.rand(1, c, 1, 1).astype("f")
              for i, c in enumerate((64, 192, 999, 256, 256))})
    results, ok = verify_drop(str(bad))
    assert not ok
    assert results[0]["status"] == "INVALID" and "lin2" in results[0]["detail"]


def test_corrupt_i3d_rejected(drop, tmp_path):
    bad = tmp_path / "bad_i3d"
    (bad / "i3d").mkdir(parents=True)
    specs = expected_variable_specs()
    arrays = {p: np.zeros(s, np.float32) for p, s in specs[:-1]}  # drop one
    np.savez(bad / "i3d" / "i3d_kinetics400.npz", **arrays)
    results, ok = verify_drop(str(bad))
    assert not ok and "missing" in results[0]["detail"]


def test_truncated_pt_rejected(drop, tmp_path):
    bad = tmp_path / "bad_ckpt"
    ck = bad / "checkpoints" / "smmnist"
    ck.mkdir(parents=True)
    data = (drop / "checkpoints" / "smmnist" / "model.pt").read_bytes()
    (ck / "model.pt").write_bytes(data[: len(data) // 2])
    (ck / "config.json").write_text(json.dumps(TINY))
    results, ok = verify_drop(str(bad))
    assert not ok and results[0]["status"] == "INVALID"


def test_wrong_config_checkpoint_rejected(drop, tmp_path):
    """A .pt whose tensors don't match its config.json must be caught."""
    bad = tmp_path / "bad_cfg"
    ck = bad / "checkpoints" / "smmnist"
    ck.mkdir(parents=True)
    data = (drop / "checkpoints" / "smmnist" / "model.pt").read_bytes()
    (ck / "model.pt").write_bytes(data)
    wrong = dict(TINY, archi="vgg", skipco=True)
    (ck / "config.json").write_text(json.dumps(wrong))
    results, ok = verify_drop(str(bad))
    assert not ok and results[0]["status"] == "INVALID"


def test_bad_test_set_rejected(tmp_path):
    ds = tmp_path / "datasets"
    ds.mkdir()
    # float32 instead of uint8
    np.savez(ds / "svg_test_set_40.npz",
             sequences=np.zeros((4, 40, 64, 64), np.float32))
    results, ok = verify_drop(str(tmp_path))
    assert not ok and "uint8" in results[0]["detail"]


def test_short_time_dim_rejected(tmp_path):
    """A drop with many videos but too-short clips must be rejected: the
    length check constrains the TIME axis, not 'either leading dim' (a
    1000-video count would otherwise always satisfy it)."""
    ds = tmp_path / "datasets"
    ds.mkdir()
    # 1000 KTH videos of only 20 frames — protocol needs 40
    np.savez(ds / "svg_test_set_40.npz",
             sequences=np.zeros((1000, 20, 64, 64), np.uint8))
    results, ok = verify_drop(str(tmp_path))
    assert not ok and "time dim 20" in results[0]["detail"]


def test_empty_drop_reports_empty(tmp_path):
    results, ok = verify_drop(str(tmp_path))
    assert results == [] and not ok


class TestManifestContract:
    """--check_manifest: byte-identity revalidation of an accepted drop."""

    def _record(self, drop, path):
        results, ok = verify_drop(str(drop))
        assert ok
        path.write_text(json.dumps(
            {"drop": str(drop), "ok": ok, "artifacts": results}))
        return results

    def test_unchanged_drop_accepted(self, drop, tmp_path):
        from scripts.verify_artifacts import check_against_manifest
        manifest = tmp_path / "accepted.json"
        self._record(drop, manifest)
        results, _ = verify_drop(str(drop))
        rows, ok = check_against_manifest(results, str(manifest))
        assert ok and all(r["status"] == "ok" for r in rows)
        assert len(rows) >= 9

    def test_changed_bytes_rejected(self, drop, tmp_path):
        import shutil
        from scripts.verify_artifacts import check_against_manifest
        manifest = tmp_path / "accepted.json"
        self._record(drop, manifest)
        # copy the drop and flip one payload byte in a still-structurally-
        # valid artifact: only the sha256 contract can catch this
        clone = tmp_path / "clone"
        shutil.copytree(drop, clone)
        idx = clone / "mnist" / "train-images-idx3-ubyte.gz"
        import gzip as _gzip
        import struct as _struct
        with _gzip.open(idx, "wb") as f:
            f.write(_struct.pack(">IIII", 2051, 3, 28, 28))
            f.write(b"\x01" + bytes(3 * 28 * 28 - 1))
        results, ok = verify_drop(str(clone))
        assert ok  # structurally still a valid idx file...
        rows, mok = check_against_manifest(results, str(manifest))
        assert not mok  # ...but the byte-identity contract rejects it
        changed = [r for r in rows if r["status"] == "CHANGED"]
        assert len(changed) == 1
        assert changed[0]["path"].endswith("train-images-idx3-ubyte.gz")

    def test_missing_artifact_rejected(self, drop, tmp_path):
        import os
        import shutil
        from scripts.verify_artifacts import check_against_manifest
        manifest = tmp_path / "accepted.json"
        self._record(drop, manifest)
        clone = tmp_path / "clone_missing"
        shutil.copytree(drop, clone)
        os.remove(clone / "i3d" / "i3d_kinetics400.npz")
        results, _ = verify_drop(str(clone))
        rows, mok = check_against_manifest(results, str(manifest))
        assert not mok
        assert any(r["status"] == "MISSING"
                   and r["artifact"] == "i3d-kinetics400" for r in rows)

    def test_not_ok_manifest_rejected(self, drop, tmp_path):
        from scripts.verify_artifacts import check_against_manifest
        manifest = tmp_path / "bad.json"
        manifest.write_text(json.dumps({"ok": False, "artifacts": []}))
        results, _ = verify_drop(str(drop))
        rows, mok = check_against_manifest(results, str(manifest))
        assert not mok and rows[0]["status"] == "REJECTED"

    def test_cli_check_manifest_exit_codes(self, drop, tmp_path):
        manifest = tmp_path / "accepted.json"
        proc = subprocess.run(
            [sys.executable, "scripts/verify_artifacts.py", "--drop",
             str(drop), "--manifest", str(manifest)],
            capture_output=True, text=True)
        assert proc.returncode == 0, proc.stdout + proc.stderr
        proc = subprocess.run(
            [sys.executable, "scripts/verify_artifacts.py", "--drop",
             str(drop), "--check_manifest", str(manifest)],
            capture_output=True, text=True)
        assert proc.returncode == 0, proc.stdout + proc.stderr
