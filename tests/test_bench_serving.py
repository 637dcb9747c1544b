"""Smoke test for the serving-path benchmark (scripts/bench_serving.py).

The serving bench is the deployment counterpart of bench.py's training
legs: it times the exported StableHLO artifact (srvp_tpu/export.py) the
way a server would call it. If bench_one's export/load/latency plumbing
bitrots, the recorded serving numbers silently vanish. This drives
bench_one end-to-end on CPU with a tiny injected config.

The reference has no serving path to mirror (its checkpoints only feed
the in-process torch protocol, /root/reference/test.py:196-204), so the
contract locked here is ours alone: artifact round-trips through disk,
output shape honors (nt_gen, B, H, W, C), and every recorded stat is a
finite positive number.
"""

import math

import pytest

import bench
from scripts import bench_serving


TINY = dict(
    kwargs=dict(nx=64, nc=1, nf=4, nhx=16, ny=4, nz=4, skipco=False,
                nt_inf=2, nh_inf=8, nlayers_inf=2, nh_res=16,
                nlayers_res=2, archi="dcgan"),
    nt_cond=3, seq_len=6, batch=8, oversampling=1)


def test_bench_one_tiny(monkeypatch):
    monkeypatch.setitem(bench.CONFIGS, "tiny-serving", TINY)
    out = bench_serving.bench_one("tiny-serving", batches=[1, 4], iters=3,
                                  nt_gen=5)
    assert out["nt_cond"] == 3 and out["nt_gen"] == 5
    assert out["artifact_bytes"] > 0
    assert set(out["batches"]) == {"1", "4"}
    for rec in out["batches"].values():
        for key in ("latency_p50_ms", "latency_p95_ms", "frames_per_sec",
                    "device_latency_p50_ms", "device_frames_per_sec",
                    "first_call_compile_s"):
            assert math.isfinite(rec[key]) and rec[key] > 0, (key, rec)
        assert rec["latency_p95_ms"] >= rec["latency_p50_ms"]
        # e2e includes the host materialization on top of device time.
        assert rec["latency_p50_ms"] >= rec["device_latency_p50_ms"]
    # One symbolic-batch artifact served both batch sizes; throughput must
    # scale with batch (4x rows should not be slower in absolute frames/s).
    assert (out["batches"]["4"]["frames_per_sec"]
            >= out["batches"]["1"]["frames_per_sec"])
