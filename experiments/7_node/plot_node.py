"""Render the neural-ODE fit comparison (reference old/7_node/plot_node.py).

Two panels from the committed npy data: (left) one held-out trajectory --
observations, truth, the untrained rollout, and the trained rollouts of the
probabilistic-LML and RK-MSE runs; (right) training-loss curves.  Layout and
schema are this repo's own (the reference plots a single interactive figure
from its pickled dicts, old/7_node/plot_node.py:1-22).

Usage: python plot_node.py  (after `python node.py --loss lml` and
`python node.py --loss mse`; missing runs are skipped)
"""

import os

import matplotlib.pyplot as plt
import numpy as np

here = os.path.dirname(os.path.abspath(__file__))


def _load(name):
    path = os.path.join(here, name)
    if not os.path.exists(path):
        return None
    return np.load(path, allow_pickle=True)


# two loss measures on different scales -> small multiples, one axis each
fig, (ax_fit, ax_l1, ax_l2) = plt.subplots(
    1, 3, figsize=(10.5, 3.2), dpi=150, width_ratios=[2, 1, 1]
)

styles = {"lml": ("C1", "Prob. (neg. LML)"), "mse": ("C0", "RK (MSE)")}
loss_axes = {"lml": ax_l1, "mse": ax_l2}
plotted_context = False
for kind, (color, label) in styles.items():
    fits = _load(f"fits_{kind}.npy")
    losses = _load(f"losses_{kind}.npy")
    if fits is not None:
        fits = fits.item()
        if not plotted_context:
            ax_fit.plot(fits["data_ts"], fits["data_ys"][:, 0], "o",
                        color="black", ms=4, label="data")
            ax_fit.plot(fits["ts"], fits["truth"][:, 0], color="gray",
                        label="truth")
            ax_fit.plot(fits["ts"], fits["before"][:, 0], ":", color="gray",
                        label="before training")
            plotted_context = True
        ax_fit.plot(fits["ts"], fits["after"][:, 0], color=color, label=label)
    if losses is not None:
        ax = loss_axes[kind]
        losses = np.asarray(losses)
        if np.all(losses > 0):
            ax.semilogy(losses, color=color)
        else:
            ax.plot(losses, color=color)
        ax.set_xlabel("epoch")
        ax.set_title(label, fontsize=8)

ax_fit.set_xlabel("t")
ax_fit.set_ylabel("u[0]")
ax_fit.legend(fontsize=7)
ax_l1.set_ylabel("train loss")
fig.tight_layout()
out = os.path.join(here, "node.pdf")
fig.savefig(out)
print(f"wrote {out}")
