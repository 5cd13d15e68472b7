"""Smoke tests for experiment CLIs (tiny configurations).

The experiment scripts are the reference's top layer (SURVEY §2 C6-C12);
these tests import them as modules and run minutes-scale shrunk configs so
API drift in the library surfaces breaks CI, not a benchmark run.
"""

import importlib.util
import pathlib

import pytest

_EXPERIMENTS = pathlib.Path(__file__).resolve().parents[1] / "experiments"


def _load(rel):
    path = _EXPERIMENTS / rel
    spec = importlib.util.spec_from_file_location(path.stem, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.slow
def test_learn_ode_dynamics_smoke(tmp_path, monkeypatch):
    mod = _load("7_learn_ode_dynamics/learn_ode.py")
    # keep artifacts out of the repo during tests
    import numpy as np

    saved = {}
    monkeypatch.setattr(
        np, "save", lambda path, arr, **kw: saved.setdefault(str(path), arr)
    )
    mod.main(
        dataset_size=4, batch_size=2, resolution=12,
        lrs=(3e-3, 1e-3), steps=(6, 4), lengths=(0.3, 1.0),
        max_solver_steps=128,
    )
    assert any("data_losses" in k for k in saved)
    assert any("data_plots" in k for k in saved)
