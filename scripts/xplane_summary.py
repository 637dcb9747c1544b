#!/usr/bin/env python
"""Summarizes a jax.profiler .xplane.pb trace: per-op time on the TPU plane.

Standalone protobuf wire-format parsing (no tensorflow needed) via the same
minimal parser used for BAIR tfrecords. Usage:

    python scripts/xplane_summary.py /tmp/jaxtrace [top_n]
"""

import glob
import sys
from collections import defaultdict

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from preprocessing.bair.tfrecord_reader import _iter_fields  # noqa: E402


def _bytes(buf, span):
    return buf[span[0]:span[1]]


def parse_xspace(buf):
    """Returns [(plane_name, {event_name: total_duration_ps})]."""
    planes = []
    for f, w, v in _iter_fields(buf, 0, len(buf)):
        if f != 1:  # XSpace.planes
            continue
        plane_span = v
        name = ""
        metadata = {}   # id -> name
        lines = []
        for f2, w2, v2 in _iter_fields(buf, *plane_span):
            if f2 == 2:
                name = _bytes(buf, v2).decode("utf-8", "replace")
            elif f2 == 3:
                lines.append(v2)
            elif f2 == 4:  # event_metadata map entry
                mid, mname = None, ""
                for f3, w3, v3 in _iter_fields(buf, *v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 2:  # XEventMetadata
                        for f4, w4, v4 in _iter_fields(buf, *v3):
                            if f4 == 2:
                                mname = _bytes(buf, v4).decode("utf-8", "replace")
                if mid is not None:
                    metadata[mid] = mname
        durations = defaultdict(int)
        counts = defaultdict(int)
        for line_span in lines:
            for f2, w2, v2 in _iter_fields(buf, *line_span):
                if f2 != 4:  # XLine.events
                    continue
                mid, dur = None, 0
                for f3, w3, v3 in _iter_fields(buf, *v2):
                    if f3 == 1:
                        mid = v3
                    elif f3 == 3:
                        dur = v3
                if mid is not None:
                    durations[metadata.get(mid, str(mid))] += dur
                    counts[metadata.get(mid, str(mid))] += 1
        planes.append((name, durations, counts))
    return planes


def main(trace_dir, top_n=25):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.xplane.pb") \
        or glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {trace_dir}")
    with open(paths[0], "rb") as f:
        buf = f.read()
    for name, durations, counts in parse_xspace(buf):
        if not durations:
            continue
        total = sum(durations.values())
        print(f"\n=== plane: {name}  (total {total/1e9:.3f} ms summed) ===")
        rows = sorted(durations.items(), key=lambda kv: -kv[1])[:top_n]
        for op, d in rows:
            print(f"  {d/total*100:6.2f}%  {d/1e9:9.3f} ms  x{counts[op]:<5d} {op[:90]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
