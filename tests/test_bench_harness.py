"""Internal-consistency machinery of the driver bench (bench.py).

Round-4 shipped two bad records because the harness had no self-checks:
a wedged device session halved the smmnist chained number while the SAME
run's live leg outran it, and the KTH live leg recorded a prefetch-buffer
drain as throughput. These tests lock the guards that prevent a recurrence:
the rolling-record re-measure, the live<=chained cross-check, the steady-
tail requirement, and the fp32 golden-loss bookkeeping.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from scripts.bench_live import tail_ratio  # noqa: E402


class TestTailRatio:
    def test_flat_series_is_steady(self):
        assert tail_ratio([100, 900, 1000, 1010, 990, 1005]) < 1.05

    def test_decaying_series_is_not_steady(self):
        # the r04 KTH failure shape: monotone decay as the buffer drains
        assert tail_ratio([4408, 3906, 2493, 2493, 2581, 2100]) > 1.15

    def test_empty_and_zero_guard(self):
        assert tail_ratio([]) == float("inf")
        assert tail_ratio([0, 0, 0, 0]) == float("inf")


class TestHistoryRecord:
    def _write(self, path, payload):
        with open(path, "w") as f:
            json.dump(payload, f)

    def test_reads_driver_wrapped_and_bare_formats(self, tmp_path):
        self._write(tmp_path / "BENCH_r01.json", {
            "rc": 0, "parsed": {"configs": {
                "smmnist-dcgan": {"train_frames_per_sec_per_chip": 70000.0}}}})
        self._write(tmp_path / "BENCH_r02.json", {  # bare bench output
            "configs": {
                "smmnist-dcgan": {"train_frames_per_sec_per_chip": 78061.0},
                "kth-vgg": {"train_frames_per_sec_per_chip": 6920.0}}})
        rec = bench.history_record(repo=str(tmp_path))
        assert rec["smmnist-dcgan"] == 78061.0  # max across rounds
        assert rec["kth-vgg"] == 6920.0

    def test_tolerates_corrupt_and_irrelevant_files(self, tmp_path):
        (tmp_path / "BENCH_r01.json").write_text("{not json")
        self._write(tmp_path / "BENCH_r02.json", {"rc": 124, "parsed": None})
        assert bench.history_record(repo=str(tmp_path)) == {}


class TestMeasureChained:
    def test_remeasures_once_below_record(self, monkeypatch):
        calls = []

        def fake_bench_ours(name):
            calls.append(name)
            # first measurement wedged at 40k, re-measure healthy at 78k
            fps = 40000.0 if len(calls) == 1 else 78000.0
            return fps, {"loss": 1.0}

        monkeypatch.setattr(bench, "bench_ours", fake_bench_ours)
        entry = bench.measure_chained(
            "smmnist-dcgan", {"smmnist-dcgan": 78061.0}, baseline=None)
        assert len(calls) == 2
        assert entry["train_frames_per_sec_per_chip"] == 78000.0
        assert "remeasure_note" in entry
        assert "anomaly_note" not in entry

    def test_persistent_regression_is_annotated_not_hidden(self, monkeypatch):
        monkeypatch.setattr(bench, "bench_ours",
                            lambda name: (40000.0, {"loss": 1.0}))
        entry = bench.measure_chained(
            "smmnist-dcgan", {"smmnist-dcgan": 78061.0}, baseline=None)
        assert entry["train_frames_per_sec_per_chip"] == 40000.0
        assert "anomaly_note" in entry

    def test_healthy_measurement_not_retried(self, monkeypatch):
        calls = []

        def fake_bench_ours(name):
            calls.append(name)
            return 77000.0, {"loss": 1.0}

        monkeypatch.setattr(bench, "bench_ours", fake_bench_ours)
        entry = bench.measure_chained(
            "smmnist-dcgan", {"smmnist-dcgan": 78061.0}, baseline=None)
        assert len(calls) == 1
        assert "anomaly_note" not in entry
        assert entry["rolling_record_frames_per_sec_per_chip"] == 78061.0


class TestGoldenLoss:
    def test_records_then_detects_deviation(self, tmp_path, monkeypatch):
        monkeypatch.setattr(bench, "GOLDEN_CACHE",
                            str(tmp_path / "bench_golden.json"))
        vals = iter([12345.678, 12345.678, 13000.0])
        monkeypatch.setattr(bench, "golden_loss_step2",
                            lambda name: next(vals))
        info = {"x": {}}
        bench.check_golden_losses(info)  # first run records
        assert info["x"]["loss_step2_fp32"] == 12345.678
        assert info["x"]["golden_loss_step2"] == 12345.678
        assert "golden_loss_note" not in info["x"]

        info2 = {"x": {}}
        bench.check_golden_losses(info2)  # identical -> no note
        assert "golden_loss_note" not in info2["x"]

        info3 = {"x": {}}
        bench.check_golden_losses(info3)  # 5% off -> annotated
        assert "golden_loss_note" in info3["x"]
        # the stored golden is never silently overwritten by a deviation
        assert info3["x"]["golden_loss_step2"] == 12345.678

    def test_nonfinite_fp32_loss_fails_loudly(self, tmp_path, monkeypatch):
        monkeypatch.setattr(bench, "GOLDEN_CACHE",
                            str(tmp_path / "bench_golden.json"))
        monkeypatch.setattr(bench, "golden_loss_step2",
                            lambda name: float("nan"))
        with pytest.raises(AssertionError):
            bench.check_golden_losses({"x": {}})
