"""Figure for the headline TPU work-precision sweep (bench.py output).

Reads data_workprec_full.json (written by bench.py on real hardware) and
renders workprec_tpu.pdf: (left) batched throughput vs rtol for the f32 and
df32-pair fused Pallas engines against the reference's CPU rate on the same
solver/problem; (right) the on-chip accuracy gate, RMSE/rtol per row, with
the bench's 3x bound.  One measure per axis; hues follow the engine
identity (validated categorical palette), context lines stay neutral.

Usage: python plot.py  (after bench.py; reads committed data otherwise)
"""

import json
import os

import matplotlib.pyplot as plt

# validated categorical slots (dataviz palette, light mode)
C_F32 = "#2a78d6"   # slot 1: f32 fused engine
C_DF32 = "#eb6834"  # slot 2: df32 pair engine
C_NEUTRAL = "#6b6a63"

here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, "data_workprec_full.json")) as f:
    data = json.load(f)
rows = data["rows"]

bands = {}
for r in rows:
    bands.setdefault(r["dtype"], []).append(r)

fig, (ax_thru, ax_acc) = plt.subplots(1, 2, figsize=(9, 3.4), dpi=150)

for ax in (ax_thru, ax_acc):
    ax.set_xscale("log")
    ax.invert_xaxis()  # work-precision convention: tighter to the right
    ax.grid(True, which="major", color="0.92", linewidth=0.8)
    ax.set_axisbelow(True)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    ax.set_xlabel("rtol")

styles = {
    "float32": (C_F32, "o", "f32 fused Pallas"),
    "df32": (C_DF32, "s", "df32 pairs fused Pallas"),
    "float64": (C_NEUTRAL, "^", "f64 (XLA x64 fallback)"),
}
for dtype, rs in bands.items():
    color, marker, label = styles.get(dtype, (C_NEUTRAL, "x", dtype))
    rt = [r["rtol"] for r in rs]
    ax_thru.plot(rt, [r["solves_per_sec"] for r in rs], marker=marker,
                 ms=5, lw=2, color=color, label=label)
    ax_acc.plot(rt, [r["rmse"] / r["rtol"] for r in rs], marker=marker,
                ms=5, lw=2, color=color, label=label)

# context: the reference's committed CPU rate on the same solver/problem
rt_all = [r["rtol"] for r in rows]
ax_thru.plot(rt_all, [1.0 / r["ref_seconds_per_solve"] for r in rows],
             "--", lw=1.5, color=C_NEUTRAL, label="reference CPU (1 solve)")
ax_thru.set_yscale("log")
ax_thru.set_ylabel("solves / s (one TPU chip)")
ax_thru.set_title(
    f"batch {rows[0]['batch']}, rigid body, TS0(4) fixedpoint save_at",
    fontsize=9,
)
ax_thru.legend(fontsize=7, frameon=False)

ax_acc.axhline(3.0, ls="--", lw=1.5, color=C_NEUTRAL)
ax_acc.annotate("bench gate (3x)", xy=(rt_all[-1], 3.0), fontsize=7,
                color=C_NEUTRAL, va="bottom", ha="left")
ax_acc.set_yscale("log")
ax_acc.set_ylabel("RMSE / rtol (vs LSODA 1e-12)")
ax_acc.set_title("on-chip accuracy per tolerance row", fontsize=9)
ax_acc.legend(fontsize=7, frameon=False)

fig.tight_layout()
out = os.path.join(here, "workprec_tpu.pdf")
fig.savefig(out)
print(f"wrote {out}")
