"""Plot experiment 4: Brusselator memory/runtime scaling + solution heatmap
(reference experiments/4_brusselator/plot.py)."""

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
    ckpt = np.load(os.path.join(here, "data_checkpoint.npy"), allow_pickle=True).item()
    textbook = np.load(os.path.join(here, "data_textbook.npy"), allow_pickle=True).item()

    plt.rcParams.update(exp_util.plot_params())
    fig, axes = plt.subplots(1, 3, figsize=(10.5, 3.2))
    ax_mem, ax_rt, ax_sol = axes

    n_c = np.asarray(ckpt["N"], float)
    ax_mem.loglog(n_c * 2, np.asarray(ckpt["memory"]), "o-", label="checkpoint (ours)")
    n_t = np.asarray(textbook["N"], float)
    ax_mem.loglog(
        n_t * 2, np.asarray(textbook["memory"]), "s--", label="textbook (est.)"
    )
    ax_mem.axhline(8 * 1024, color="red", lw=0.6, ls="dotted", label="8 GB")
    ax_mem.set_xlabel("state dimension $2N$")
    ax_mem.set_ylabel("memory (MB)")
    ax_mem.legend(fontsize=6)

    ax_rt.loglog(n_c * 2, np.asarray(ckpt["runtime"]), "o-", label="checkpoint")
    rt_t = np.asarray(textbook["runtime"])
    ax_rt.loglog(n_t[: len(rt_t)] * 2, rt_t, "s--", label="textbook")
    ax_rt.set_xlabel("state dimension $2N$")
    ax_rt.set_ylabel("runtime incl. compile (s)")
    ax_rt.legend(fontsize=6)

    ts = np.asarray(ckpt["ts"][-1])
    ys = np.asarray(ckpt["ys"][-1])
    n_last = int(ckpt["N"][-1])
    xs = np.linspace(0, 1, num=n_last)
    t_mesh, x_mesh = np.meshgrid(ts, xs)
    ax_sol.pcolormesh(t_mesh, x_mesh, ys[:, :n_last].T, shading="auto")
    ax_sol.set_xlabel("$t$")
    ax_sol.set_ylabel("$x$")
    ax_sol.set_title(f"$u(t, x)$, N={n_last}")

    fig.savefig(os.path.join(here, "brusselator.pdf"))
    print("wrote brusselator.pdf")


if __name__ == "__main__":
    main()
