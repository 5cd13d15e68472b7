"""Run-to-run variance of the bench.py headline (VERDICT round-4 weak #6).

The round-4 committed headline was 69,050 tuned solves/s while an
intermediate run the same day logged 70,500 — a ~2% gap nobody had
characterized.  This script runs ``bench.py`` N times in fresh
subprocesses on the same chip, parses the final JSON line of each, and
commits the spread (per-run tuned + strict headline values, min/median/
max, relative spread) to ``data_bench_variance.json``.

Fresh subprocesses, not in-process repeats: the variance sources under
test include compile-cache state, relay session warmup, and allocator
layout — all process-scoped.

Usage: python bench_variance.py [--runs 3]
"""

import argparse
import json
import pathlib
import statistics
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--timeout", type=float, default=2400.0,
                    help="per-run subprocess timeout (seconds)")
    args = ap.parse_args(argv)

    runs = []
    for i in range(args.runs):
        print(f"--- bench run {i + 1}/{args.runs}", flush=True)
        proc = subprocess.run(
            [sys.executable, str(REPO / "bench.py")],
            capture_output=True, text=True, timeout=args.timeout,
        )
        line = None
        for ln in reversed(proc.stdout.strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if proc.returncode != 0 or line is None:
            print(f"run {i + 1} FAILED rc={proc.returncode}\n"
                  f"{proc.stderr[-2000:]}", flush=True)
            runs.append({"run": i + 1, "rc": proc.returncode,
                         "error": proc.stderr[-500:]})
            continue
        row = json.loads(line)
        rec = {
            "run": i + 1,
            "value": row["value"],
            "parity_solves_per_sec": row.get("parity_solves_per_sec"),
            "rmse_max_over_rtol": row.get("rmse_max_over_rtol"),
            "capped_lanes": row.get("capped_lanes"),
        }
        print(json.dumps(rec), flush=True)
        runs.append(rec)
        _flush(args, runs)

    _flush(args, runs)


def _flush(args, runs):
    ok = [r for r in runs if "value" in r]
    summary = {}
    for key in ("value", "parity_solves_per_sec"):
        vals = [r[key] for r in ok if r.get(key) is not None]
        if vals:
            summary[key] = {
                "min": min(vals),
                "median": statistics.median(vals),
                "max": max(vals),
                "rel_spread": (max(vals) - min(vals)) / statistics.median(vals),
            }
    out = {"runs": runs, "summary": summary}
    path = pathlib.Path(__file__).parent / "data_bench_variance.json"
    path.write_text(json.dumps(out, indent=2))
    if summary:
        print("summary:", json.dumps(summary), flush=True)
    print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
