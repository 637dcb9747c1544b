"""Smoke test for the live-throughput harness (scripts/bench_live.py).

bench.py's `live` legs (and BENCH_r*.json's live key) run through
run_live(); if its interval rounding or metrics parsing bitrots, the
driver's bench silently reports null live numbers. This drives run_live
end-to-end on CPU with a tiny injected config, including a
steps_per_dispatch that does NOT divide the config's log_interval (the
rounding path at scripts/bench_live.py:68).

Reference equivalent being measured by the real harness: the hot loop at
/root/reference/train.py:321-372 (loader + H2D + step wall rate).
"""

import math

import pytest

from scripts import bench_live


TINY = dict(
    argv="--dataset smmnist --allow_synthetic --archi dcgan "
         "--ny 4 --nz 4 --nt_inf 2 --nt_cond 3 --n_euler_steps 1 --nc 1 "
         "--nf 4 --nhx 8 --nh_inf 8 --nlayers_inf 2 --nh_res 16 "
         "--nlayers_res 2 --batch_size 8 --seq_len 6 --seed 7",
    n_iter=18, log_interval=3, dataset="smmnist")


@pytest.mark.parametrize("k", [1, 2])
def test_run_live_tiny(tmp_path, monkeypatch, k):
    monkeypatch.setitem(bench_live.LIVE_CONFIGS, "tiny", TINY)
    med, samples = bench_live.run_live(
        "tiny", k, str(tmp_path / "data"), keep_xp=str(tmp_path / "xp"))
    # k=2 rounds log_interval 3 -> 4 and must still produce fps samples;
    # the loop runs n_iter=9 with window k, so >= 2 log rows exist.
    assert samples, "no fps samples parsed from metrics.jsonl"
    assert isinstance(med, float) and math.isfinite(med) and med > 0
    assert all(f > 0 for f in samples)


def test_data_dir_for_smmnist(tmp_path):
    d = bench_live.data_dir_for("smmnist-dcgan", str(tmp_path))
    assert d.endswith("smmnist")
