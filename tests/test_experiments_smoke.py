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


def _no_save(monkeypatch):
    """Redirect np.save / jnp.save into a dict: experiments keep their
    committed data files; smoke runs must not overwrite them."""
    import jax.numpy as jnp
    import numpy as np

    saved = {}

    def fake_save(path, arr=None, **kw):
        saved[str(path)] = arr

    monkeypatch.setattr(np, "save", fake_save)
    monkeypatch.setattr(jnp, "save", fake_save, raising=False)
    return saved


@pytest.mark.slow
def test_exp1_vdp_smoke(monkeypatch):
    mod = _load("1_van_der_pol/vdp.py")
    saved = _no_save(monkeypatch)
    mod.main(max_fixed_steps=4000)
    assert any("vdp_baseline_grid" in k for k in saved)
    assert any("vdp_num_steps" in k for k in saved)


@pytest.mark.slow
def test_exp2_workprec_simple_smoke(monkeypatch):
    import sys

    mod = _load("2_workprec_simple/run_simple.py")
    saved = _no_save(monkeypatch)
    monkeypatch.setattr(
        sys, "argv", ["run_simple.py", "--start", "3", "--stop", "4", "--repeats", "1"]
    )
    mod.main()
    assert any("data_results" in k for k in saved)


@pytest.mark.slow
def test_exp3_workprec_harder_smoke(monkeypatch):
    import sys

    mod = _load("3_workprec_harder/run_harder.py")
    saved = _no_save(monkeypatch)
    monkeypatch.setattr(
        sys, "argv", ["run_harder.py", "--start", "3", "--stop", "4", "--repeats", "1"]
    )
    mod.main()
    assert any("data_results" in k for k in saved)


@pytest.mark.slow
def test_exp4_brusselator_smoke(monkeypatch):
    mod = _load("4_brusselator/run.py")
    saved = _no_save(monkeypatch)
    mod.main(powers=[1], textbook=True)
    assert any("data_checkpoint" in k for k in saved)
    assert any("data_textbook" in k for k in saved)


@pytest.mark.slow
def test_exp5_vs_interpolation_smoke(monkeypatch):
    mod = _load("5_vs_interpolation/measure.py")
    saved = _no_save(monkeypatch)
    mod.main(num_samples=[2], tol_exponents=[3], num_save_at=5)
    assert any("data_results" in k for k in saved)


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
