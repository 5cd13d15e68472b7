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


fig, (ax_fit, ax_loss) = plt.subplots(1, 2, figsize=(9, 3.5), dpi=150)

styles = {"lml": ("C1", "Prob. (neg. LML)"), "mse": ("C0", "RK (MSE)")}
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
        # LML and MSE live on different scales; normalize to the start
        ax_loss.semilogy(
            np.maximum(np.asarray(losses) - np.min(losses) + 1e-12, 1e-12)
            / max(losses[0] - np.min(losses), 1e-12),
            color=color, label=label,
        )

ax_fit.set_xlabel("t")
ax_fit.set_ylabel("u[0]")
ax_fit.legend(fontsize=7)
ax_loss.set_xlabel("epoch")
ax_loss.set_ylabel("loss (shifted, rel. to start)")
ax_loss.legend(fontsize=7)
fig.tight_layout()
out = os.path.join(here, "node.pdf")
fig.savefig(out)
print(f"wrote {out}")
