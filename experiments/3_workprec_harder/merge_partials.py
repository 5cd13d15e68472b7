"""Assemble data_results.npy from the main and --only side-process partials.

The round-5 regen pattern: Prob(8) takes >4.5 h on this 1-core box, so the
four cheap baseline rows are farmed to a side process
(``run_harder.py --only "rk,nystrom" --partial-suffix .rk``) while the main
process grinds the probabilistic rows.  This merges whatever both partials
hold into the committed file (reference contract:
/root/reference/experiments/3_workprec_harder/run_harder.py:105-112 commits
the data its script produces).
"""
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

HERE = pathlib.Path(__file__).parent
ORDER = [
    "Prob(3) via probabilistic",
    "Prob(5) via probabilistic",
    "Prob(8) via probabilistic",
    "Bosh3() via rk",
    "Tsit5() via rk",
    "Dopri8() via rk",
    "Yoshida4() via nystrom",
]


def main():
    merged = {}
    for name in ["data_results.partial.npy", "data_results.partial.rk.npy"]:
        p = HERE / name
        if p.exists():
            part = np.load(p, allow_pickle=True).item()
            print(f"{name}: {list(part)}")
            merged.update(part)
    ordered = {k: merged[k] for k in ORDER if k in merged}
    missing = [k for k in ORDER if k not in merged]
    np.save(HERE / "data_results.npy", ordered, allow_pickle=True)
    print(f"wrote data_results.npy with {len(ordered)}/{len(ORDER)} rows"
          + (f"; MISSING: {missing}" if missing else ""))


if __name__ == "__main__":
    main()
