"""Plot experiment 2: work-precision + memory (reference plot_simple.py)."""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")  # unpickling jnp arrays needs a backend

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import exp_util  # noqa: E402


def main():
    here = os.path.dirname(__file__)
    results = np.load(os.path.join(here, "data_results.npy"), allow_pickle=True).item()
    ts = np.load(os.path.join(here, "data_ts.npy"))
    ys = np.load(os.path.join(here, "data_ys.npy"))
    checkpoints = np.load(os.path.join(here, "data_checkpoints.npy"))

    plt.rcParams.update(exp_util.plot_params())
    style = exp_util.style_simple()

    fig, axes = plt.subplots(1, 3, figsize=(10, 3))
    ax_sol, ax_wp, ax_mem = axes

    ax_sol.plot(ts, ys, lw=0.7)
    for x in np.asarray(checkpoints):
        ax_sol.axvline(x, color="gray", lw=0.4, ls="dotted")
    ax_sol.set_title("Rigid body + checkpoints")
    ax_sol.set_xlabel("$t$")

    for label, wp in results.items():
        kw = dict(
            marker=style.marker(label),
            color=style.color(label),
            linestyle=style.linestyle(label),
            zorder=style.zorder(label),
            label=style.label(label),
            markersize=4,
        )
        ax_wp.loglog(np.asarray(wp["precision"]), np.asarray(wp["work_min"]), **kw)
        ax_mem.loglog(
            np.asarray(wp["precision"]),
            np.asarray(wp["length_of_longest_vector"]),
            **kw,
        )
    ax_wp.set_xlabel("RMSE at checkpoints")
    ax_wp.set_ylabel("wall time (s)")
    ax_wp.set_title("Work vs precision")
    ax_wp.legend(fontsize=6)
    ax_mem.set_xlabel("RMSE at checkpoints")
    ax_mem.set_ylabel("# stored states")
    ax_mem.set_title("Memory vs precision")
    fig.savefig(os.path.join(here, "workprec_simple.pdf"))
    print("wrote workprec_simple.pdf")


if __name__ == "__main__":
    main()
