"""Training-state checkpoint/resume (odecheckpts_tpu.checkpointing).

Beyond the reference's scope (it persists only experiment results, e.g.
/root/reference/experiments/4_brusselator/run.py); contract here: a ``fit``
run interrupted at step k and restarted with the same ``checkpoint_dir``
reproduces the uninterrupted run exactly — same theta, same loss history —
because the optimizer state round-trips, not just the parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from odecheckpts_tpu import checkpointing, train

optax = pytest.importorskip("optax")


def _quadratic_loss():
    target = jnp.asarray([1.0, -2.0, 0.5])

    def loss_fn(theta):
        return jnp.sum((theta["w"] - target) ** 2) + theta["b"] ** 2

    theta0 = {"w": jnp.zeros(3), "b": jnp.asarray(1.0)}
    return loss_fn, theta0


def test_save_restore_roundtrip(tmp_path):
    state = {
        "theta": {"w": jnp.arange(3.0), "b": jnp.asarray(2.0)},
        "opt_state": optax.adam(1e-2).init({"w": jnp.arange(3.0)}),
        "losses": np.asarray([3.0, 2.0]),
    }
    checkpointing.save(tmp_path, 7, state)
    assert checkpointing.latest_step(tmp_path) == 7
    restored = checkpointing.restore(tmp_path)
    assert restored["step"] == 7
    np.testing.assert_allclose(restored["theta"]["w"], np.arange(3.0))
    np.testing.assert_allclose(restored["losses"], [3.0, 2.0])


def test_max_to_keep_prunes_old_steps(tmp_path):
    for step in (1, 2, 3, 4):
        checkpointing.save(tmp_path, step, {"x": jnp.ones(2)}, max_to_keep=2)
    assert checkpointing.latest_step(tmp_path) == 4
    assert checkpointing.restore(tmp_path, step=3) is not None
    with pytest.raises(Exception):
        checkpointing.restore(tmp_path, step=1)


def test_restore_empty_dir_returns_none(tmp_path):
    assert checkpointing.restore(tmp_path / "nothing") is None
    assert checkpointing.latest_step(tmp_path / "nothing") is None


def test_fit_resume_matches_uninterrupted_run(tmp_path):
    loss_fn, theta0 = _quadratic_loss()
    opt = optax.adam(0.1)

    theta_full, losses_full = train.fit(loss_fn, theta0, opt, num_steps=20)

    ckpt = tmp_path / "run"
    # phase 1: stops after 10 steps, checkpointing every 5
    theta_a, losses_a = train.fit(
        loss_fn, theta0, opt, num_steps=10,
        checkpoint_dir=ckpt, checkpoint_every=5,
    )
    assert checkpointing.latest_step(ckpt) == 10
    # phase 2: same call with the full num_steps resumes at step 10
    theta_b, losses_b = train.fit(
        loss_fn, theta0, opt, num_steps=20,
        checkpoint_dir=ckpt, checkpoint_every=5,
    )
    assert len(losses_b) == 20
    np.testing.assert_allclose(losses_b, losses_full, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        theta_b, theta_full,
    )


def test_fit_resume_restores_optimizer_state_not_just_theta(tmp_path):
    """Adam's moment buffers must survive the round-trip: restarting with a
    fresh optimizer state from the checkpointed theta gives a DIFFERENT
    trajectory, which is exactly the bug this subsystem exists to prevent."""
    loss_fn, theta0 = _quadratic_loss()
    opt = optax.adam(0.1)

    _theta_full, losses_full = train.fit(loss_fn, theta0, opt, num_steps=20)

    ckpt = tmp_path / "run"
    train.fit(loss_fn, theta0, opt, num_steps=10,
              checkpoint_dir=ckpt, checkpoint_every=10)
    state = checkpointing.restore(ckpt)
    # fresh-optimizer restart from the same theta diverges from the true tail
    theta_mid = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(theta0),
        jax.tree_util.tree_leaves(state["theta"]),
    )
    _theta_c, losses_c = train.fit(loss_fn, theta_mid, opt, num_steps=10)
    assert not np.allclose(losses_c, losses_full[10:], rtol=1e-6)
