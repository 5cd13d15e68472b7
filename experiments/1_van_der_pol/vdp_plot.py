"""Plot experiment 1: step-size profile + solution (reference vdp_plot.py)."""

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
    grid = np.load(os.path.join(here, "vdp_baseline_grid.npy"))
    solution = np.load(os.path.join(here, "vdp_baseline_solution.npy"))
    rt_adaptive = float(np.load(os.path.join(here, "vdp_runtime_adaptive.npy")))
    rt_fixed = float(np.load(os.path.join(here, "vdp_runtime_fixed_accurate.npy")))
    nsteps = np.load(os.path.join(here, "vdp_num_steps.npy"))

    plt.rcParams.update(exp_util.plot_params())
    fig, (ax0, ax1) = plt.subplots(2, 1, figsize=(5, 4), sharex=True)
    ax0.plot(grid, solution[:, 0], lw=0.8)
    ax0.set_ylabel("$u(t)$")
    ax0.set_title(
        f"Van der Pol ($\\mu=10^3$): adaptive {int(nsteps[0]):,} steps "
        f"({rt_adaptive:.3f}s) vs uniform {int(nsteps[1]):,} steps ({rt_fixed:.2f}s)",
        fontsize=9,
    )
    ax1.semilogy(grid[:-1], np.diff(grid), lw=0.8)
    ax1.set_ylabel("$\\Delta t$")
    ax1.set_xlabel("$t$")
    fig.savefig(os.path.join(here, "vdp.pdf"))
    print("wrote vdp.pdf")


if __name__ == "__main__":
    main()
