"""Per-decade error-calibration (kappa) sweep on TPU (VERDICT round-3 #5).

Round 3's global kappa=10 calibration bought RMSE <= 0.42x rtol at every
decade — against bench gates of 3x aggregate / 6x worst-lane.  The unused
margin is paid for in steps (kappa^(1/(nu+1)) each), costing ~31% aggregate
throughput vs round 2.  Like the tuned-order schedule
(data_order_sweep.json), kappa is a per-tolerance work-precision lever and
this script MEASURES it: the full bench workload (rigid body TS0(4)
fixedpoint, bench.py's engines and dtype bands, smaller batch) across
kappa candidates per decade, recording RMSE/rtol, worst-lane/rtol, steps,
and solves/s.

Selection rule (applied by ``--select``): per decade, the smallest kappa
whose measured RMSE <= 0.8x rtol AND worst sampled lane <= 3x rtol — half
the bench gates, so batch-size growth in the full bench cannot flip a
pass into a failure.  The winners feed bench.py's KAPPA_F32/KAPPA_F64
defaults; the 3x/6x gates themselves are untouched.

Usage: python kappa_sweep.py [--batch32 8192] [--batch64 4096] [--select]
Writes data_kappa_sweep.json next to this script.
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import bench  # noqa: E402  (repo-root bench.py: the workload under test)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch32", type=int, default=8192)
    ap.add_argument("--batch64", type=int, default=4096)
    ap.add_argument("--sample", type=int, default=256)
    ap.add_argument(
        "--kappas", type=float, nargs="*", default=[1.0, 2.0, 3.0, 5.0, 10.0]
    )
    ap.add_argument("--select", action="store_true",
                    help="print the per-decade winners after measuring")
    ap.add_argument("--tuned", action="store_true",
                    help="measure at the TUNED-order schedule (NU_*_TUNED) "
                         "over only the decades whose tuned order differs "
                         "from the parity nu=4; feeds KAPPA_*_TUNED")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    bench._wait_for_device()
    print(f"# device: {jax.devices()[0]}", file=sys.stderr, flush=True)

    if args.tuned:
        rtols32 = [r for r in bench.SWEEP_F32
                   if bench.NU_F32_TUNED.get(r, 4) != bench.NU_F32.get(r, 4)]
        rtols64 = [r for r in bench.SWEEP_F64
                   if bench.NU_F64_TUNED.get(r, 4) != bench.NU_F64.get(r, 4)]
        nu32, nu64 = bench.NU_F32_TUNED, bench.NU_F64_TUNED
    else:
        rtols32, rtols64 = bench.SWEEP_F32, bench.SWEEP_F64
        nu32, nu64 = None, None

    rows = []
    for kappa in args.kappas:
        if rtols32:
            print(f"# --- kappa={kappa} (f32 band) ---", file=sys.stderr,
                  flush=True)
            rows += bench._sweep(
                jnp.float32, rtols32, args.batch32, "pallas-loop",
                sample=args.sample, gate=False, nu_map=nu32,
                kappa_map={r: kappa for r in rtols32},
            )
        if rtols64:
            print(f"# --- kappa={kappa} (df32 band) ---", file=sys.stderr,
                  flush=True)
            rows += bench._sweep_hi(
                rtols64, args.batch64, sample=args.sample, gate=False,
                nu_map=nu64, kappa_map={r: kappa for r in rtols64},
            )

    out = {
        "device": str(jax.devices()[0]),
        "batch32": args.batch32,
        "batch64": args.batch64,
        "sample": args.sample,
        "rows": rows,
    }
    name = "data_kappa_sweep_tuned.json" if args.tuned else "data_kappa_sweep.json"
    path = pathlib.Path(__file__).parent / name
    path.write_text(json.dumps(out, indent=2))
    print(f"wrote {path}")

    if args.select:
        select(rows)
    return out


def select(rows):
    """Per decade: smallest kappa with rmse <= 0.8x rtol, lane <= 3x rtol,
    0 capped lanes."""
    by_rtol = {}
    for r in rows:
        by_rtol.setdefault(r["rtol"], []).append(r)
    winners = {}
    for rtol, cands in sorted(by_rtol.items(), reverse=True):
        ok = [
            c for c in cands
            if c["rmse"] <= 0.8 * rtol
            and c["rmse_max_lane"] <= 3.0 * rtol
            and c["capped_lanes"] == 0
        ]
        if not ok:
            winners[rtol] = max(c["kappa"] for c in cands)
            print(f"rtol={rtol:g}: NO candidate passed; keep kappa="
                  f"{winners[rtol]}")
            continue
        best = min(ok, key=lambda c: c["kappa"])
        winners[rtol] = best["kappa"]
        print(
            f"rtol={rtol:g}: kappa={best['kappa']:g}  "
            f"rmse/rtol={best['rmse'] / rtol:.3f}  "
            f"lane/rtol={best['rmse_max_lane'] / rtol:.3f}  "
            f"steps={best['mean_steps']}  "
            f"solves/s={best['solves_per_sec']}"
        )
    return winners


if __name__ == "__main__":
    main()
