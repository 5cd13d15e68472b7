"""Render experiment 5 results as a LaTeX table (reference display_frame.py)."""

import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np


def main():
    here = os.path.dirname(__file__)
    results = np.load(
        os.path.join(here, "data_results.npy"), allow_pickle=True
    ).item()
    try:
        import pandas as pd

        frame = pd.DataFrame(results).T
        print(frame.to_latex(index=False))
    except ImportError:
        keys = list(next(iter(results.values())).keys())
        print(" & ".join(keys) + r" \\")
        for row in results.values():
            print(" & ".join(str(row.get(k, "")) for k in keys) + r" \\")


if __name__ == "__main__":
    main()
