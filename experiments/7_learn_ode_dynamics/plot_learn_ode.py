"""Render the learned-dynamics comparison figure (reference
old/7_node/plot_node.py:1-22: data / truth / before / RK / prob curves)."""

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
    losses = np.load(os.path.join(here, "data_losses.npy"), allow_pickle=True).item()
    plots = np.load(os.path.join(here, "data_plots.npy"), allow_pickle=True).item()

    plt.rcParams.update(exp_util.plot_params())
    fig, (ax_fit, ax_loss) = plt.subplots(1, 2, figsize=(8, 3))

    ax_fit.plot(plots["ins"], plots["outs"][:, 0], "o", color="black",
                markersize=2.5, label="Data")
    ax_fit.plot(plots["ts"], plots["truth"][:, 0], color="gray", label="Truth")
    ax_fit.plot(plots["ts"], plots["before"][:, 0], color="gray",
                linestyle="dotted", label="Before")
    ax_fit.plot(plots["ts"], plots["rk"][:, 0], color="C0", label="Runge-Kutta")
    ax_fit.plot(plots["ts"], plots["pn"][:, 0], color="C1", label="Prob.-Num.")
    ax_fit.set_xlabel("$t$")
    ax_fit.set_title("Neural-ODE fit (dim 0)")
    ax_fit.legend(fontsize=6)

    for mode, curve in losses.items():
        ax_loss.plot(np.arange(len(curve)), curve, label=mode)
    ax_loss.set_xlabel("training step")
    ax_loss.set_ylabel("loss")
    ax_loss.set_yscale("symlog")
    ax_loss.set_title("Training curves")
    ax_loss.legend(fontsize=6)

    fig.savefig(os.path.join(here, "learn_ode.pdf"))
    print("wrote learn_ode.pdf")


if __name__ == "__main__":
    main()
