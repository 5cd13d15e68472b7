"""Plot experiment 3: Pleiades work-precision (reference plot_harder.py)."""

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

    plt.rcParams.update(exp_util.plot_params())
    style = exp_util.style_harder()

    fig, ax = plt.subplots(figsize=(4.5, 3.2))
    for label, wp in results.items():
        ax.loglog(
            np.asarray(wp["precision"]),
            np.asarray(wp["work_min"]),
            marker=style.marker(label),
            color=style.color(label),
            linestyle=style.linestyle(label),
            zorder=style.zorder(label),
            label=style.label(label),
            markersize=4,
        )
    ax.set_xlabel("RMSE at 50 checkpoints")
    ax.set_ylabel("wall time (s)")
    ax.set_title("Pleiades (14-dim, 2nd order)")
    ax.legend(fontsize=6)
    fig.savefig(os.path.join(here, "workprec_harder.pdf"))
    print("wrote workprec_harder.pdf")


if __name__ == "__main__":
    main()
