#!/usr/bin/env python
"""Plot/summarize training-log curves (parity with
``tools/analysis_tools/analyze_logs.py``) from train_log.jsonl."""

from __future__ import annotations

import argparse
import json


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log", help="work_dir/train_log.jsonl")
    p.add_argument("--keys", nargs="+", default=["loss"])
    p.add_argument("--out", default=None, help="optional PNG path")
    args = p.parse_args()

    iters, series = [], {k: [] for k in args.keys}
    with open(args.log) as f:
        for line in f:
            rec = json.loads(line)
            iters.append(rec["iter"])
            for k in args.keys:
                series[k].append(rec.get(k))

    for k in args.keys:
        vals = [v for v in series[k] if v is not None]
        if not vals:
            print(f"{k}: (absent)")
            continue
        print(f"{k}: first={vals[0]:.4f} last={vals[-1]:.4f} "
              f"min={min(vals):.4f} max={max(vals):.4f} n={len(vals)}")

    if args.out:
        try:
            import matplotlib
            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
            for k in args.keys:
                plt.plot(iters, series[k], label=k)
            plt.xlabel("iter")
            plt.legend()
            plt.savefig(args.out, dpi=120)
            print(f"saved {args.out}")
        except ImportError:
            print("matplotlib unavailable; skipped plot")


if __name__ == "__main__":
    main()
