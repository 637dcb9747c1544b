#!/usr/bin/env python
"""Summarizes a training run's metrics.jsonl as a markdown table.

    python scripts/summarize_run.py xp/smmnist_v2 [--every 10000]
"""

import argparse
import json
import os


def main(args):
    path = os.path.join(args.xp_dir, "metrics.jsonl")
    rows, vals = [], []
    with open(path) as f:
        for line in f:
            rec = json.loads(line)
            if "val_metric" in rec:
                vals.append(rec)
            else:
                rows.append(rec)
    print(f"# Training run: {args.xp_dir}")
    if rows:
        last = rows[-1]
        fps = [r["fps"] for r in rows if r.get("fps")]
        print(f"steps: {last['step']}  wall: {last['wall_s']/3600:.2f} h "
              f"(this segment)  median fps: {sorted(fps)[len(fps)//2]:.0f}")
    print("\n| step | loss | nll | kl_y_0 | kl_z | fps |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        if r["step"] % args.every == 0:
            print(f"| {r['step']} | {r['loss']:.1f} | {r['nll']:.1f} | "
                  f"{r['kl_y_0']:.4f} | {r['kl_z']:.4f} | {r['fps']:.0f} |")
    if vals:
        print("\n| step | val best-of-N PSNR |")
        print("|---|---|")
        for r in vals:
            if r["step"] % args.every == 0 or r is vals[-1]:
                print(f"| {r['step']} | {-r['val_metric']:.3f} |")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("xp_dir")
    p.add_argument("--every", type=int, default=10000)
    main(p.parse_args())
