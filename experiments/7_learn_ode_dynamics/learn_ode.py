"""Vmapped-batch neural ODE on saturating-spiral data: prob vs RK training.

Capability parity with
/root/reference/experiments/old/7_learn_ode_dynamics/learn_ode.py:14-245:

* dataset of trajectories from the saturating rotation field
  f(y) = [x_1, -x_0] with x = y / (1 + y)  (reference :116-121);
* an MLP neural-ODE vector field (softplus, width 4, depth 2; plain pytree
  params -- no equinox);
* minibatch training via a permutation dataloader (reference :224-237),
  the loss vmapped over the batch of initial conditions (reference :51-59);
* two losses: negative log-marginal likelihood through the adaptive
  probabilistic solver (fixedpoint save_at, bounded while loop, reference
  :191-219,240-241) and MSE through the native RK solver (reference's
  diffrax mode, :179-190);
* a growing-horizon curriculum (generalizing the reference's 10%-first
  idea, :39-43,71-75): reverse-mode gradients through the adaptive RK are
  non-finite when partially-trained dynamics diverge over long horizons,
  so the training horizon grows across phases and the best full-data
  iterate is kept.

Saves data_losses.npy / data_plots.npy in the schema the reference's
old/7_node/plot_node.py reads (ins/outs/ts/truth/before/rk/pn).
"""

import argparse
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", os.environ.get("ODECKPT_PLATFORM", "cpu"))
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from odecheckpts_tpu import control_flow, facade, stats  # noqa: E402


def vf_true(u, *, t=None, p=()):
    x = u / (1.0 + u)
    return jnp.stack([x[1], -x[0]])


def mlp_init(key, sizes):
    params = []
    for fan_in, fan_out in zip(sizes[:-1], sizes[1:]):
        key, k1, k2 = jax.random.split(key, 3)
        scale = 1.0 / jnp.sqrt(1.0 * fan_in)
        params.append(
            (
                scale * jax.random.normal(k1, (fan_in, fan_out)),
                scale * jax.random.normal(k2, (fan_out,)),
            )
        )
    return params


def _softplus(x):
    # jax.nn.softplus is a custom_jvp, which Taylor-mode jet cannot trace;
    # spell it out with jet-supported primitives (inputs here are O(1))
    return jnp.log(1.0 + jnp.exp(x))


def mlp_apply(params, x):
    for w, b in params[:-1]:
        x = _softplus(x @ w + b)
    w, b = params[-1]
    return x @ w + b


def vf_model(u, *, t=None, p=None):
    return mlp_apply(p, u)


def make_data(key, dataset_size, ts):
    """Trajectories of the truth field from uniform initial conditions
    (reference :109-130; generated with the native RK stand-in for diffrax
    Tsit5)."""
    solve = facade.solve_rk(
        "tsit5", vf_true, jnp.zeros(2), ts, dt0=0.1, atol=1e-8, rtol=1e-8
    )
    u0s = jax.random.uniform(key, (dataset_size, 2), minval=-0.6, maxval=1.0)
    ys = jnp.stack([solve((u0,), ())[0] for u0 in u0s])
    return u0s, ys


def dataloader(key, dataset_size, batch_size, num_steps):
    """Epoch-permuted minibatch indices (reference :224-237)."""
    produced = 0
    while produced < num_steps:
        key, sub = jax.random.split(key)
        perm = np.asarray(jax.random.permutation(sub, dataset_size))
        for start in range(0, dataset_size - batch_size + 1, batch_size):
            if produced >= num_steps:
                return
            yield perm[start : start + batch_size]
            produced += 1


def build_losses(ts, tol, noise_std):
    solve_prob = facade.solve(
        "ts0-4", vf_model, jnp.zeros(2), ts, dt0=1.0, atol=tol, rtol=tol,
        calibrate="none",
    )
    solve_rk = facade.solve_rk(
        "tsit5", vf_model, jnp.zeros(2), ts, dt0=0.1, atol=tol, rtol=tol
    )

    def nlml_one(p, y):
        _u, aux = solve_prob((y[0],), p)
        lml = stats.log_marginal_likelihood(
            y,
            standard_deviation=noise_std * jnp.ones(len(ts)),
            posterior=aux["solution"].posterior,
        )
        return -lml

    def mse_one(p, y):
        u, _ = solve_rk((y[0],), p)
        # partially-trained dynamics can be unstable over the full horizon;
        # saturate divergent trajectories so the batch keeps a finite loss
        # (and finite gradients from the non-divergent members)
        u = jnp.nan_to_num(u, nan=1e3, posinf=1e3, neginf=-1e3)
        return jnp.mean((u - y) ** 2)

    def batched(one):
        @jax.jit
        def loss(p, ys_batch):
            return jnp.mean(jax.vmap(lambda y: one(p, y))(ys_batch))

        return loss

    return {"prob": batched(nlml_one), "rk": batched(mse_one)}


def train(mode, params0, ts, ys, *, lrs, steps, lengths, batch_size, tol,
          noise_std, max_solver_steps, seed):
    import optax

    params = params0
    losses = []
    with control_flow.overwrite_with_bounded(max_steps=max_solver_steps):
        # deterministic full-dataset loss (phase losses differ in scale with
        # the curriculum's series length, so minibatch curves are not
        # comparable across phases); training keeps the best full-data
        # iterate -- MSE-through-RK training can fall into a divergence
        # basin (all trajectories blow up -> saturated loss, zero gradients)
        # and never recover
        eval_fn = build_losses(ts, tol, noise_std)[mode]
        eval_before = float(eval_fn(params, ys))
        best = (eval_before, params)

        for phase, (lr, num_steps, length) in enumerate(zip(lrs, steps, lengths)):
            n_t = max(2, int(len(ts) * length))
            ys_phase = ys[:, :n_t]  # curriculum: truncated series first
            loss_fn = build_losses(ts[:n_t], tol, noise_std)[mode]
            # clip + skip non-finite updates: reverse-mode gradients through
            # the adaptive RK loop can spike when a proposal leaves the
            # data manifold (the reference trains with tiny batches for the
            # same reason)
            optimizer = optax.apply_if_finite(
                optax.chain(optax.clip_by_global_norm(1.0), optax.adabelief(lr)),
                max_consecutive_errors=20,
            )
            opt_state = optimizer.init(params)

            @jax.jit
            def step_fn(p, s, yb):
                val, g = jax.value_and_grad(loss_fn)(p, yb)  # noqa: B023
                upd, s = optimizer.update(g, s)  # noqa: B023
                return optax.apply_updates(p, upd), s, val

            loader = dataloader(
                jax.random.PRNGKey(seed + phase), len(ys), batch_size, num_steps
            )
            for i, idx in enumerate(loader):
                params, opt_state, val = step_fn(params, opt_state, ys_phase[idx])
                losses.append(float(val))
                if i % 5 == 0:
                    ev = float(eval_fn(params, ys))
                    if ev < best[0]:
                        best = (ev, params)
                    print(f"[{mode}] phase {phase} step {i}: loss {val:.4f} "
                          f"(full-data {ev:.4f})", flush=True)

        ev = float(eval_fn(params, ys))
        if ev < best[0]:
            best = (ev, params)
    eval_after, params = best
    print(f"[{mode}] full-dataset loss: {eval_before:.4f} -> {eval_after:.4f}",
          flush=True)
    return params, losses, (eval_before, eval_after)


def fit_curve(params, ts, y0, max_solver_steps):
    solve = facade.solve(
        "ts0-4", vf_model, jnp.zeros(2), ts, dt0=1.0, atol=1e-3, rtol=1e-3,
        calibrate="none",
    )
    with control_flow.overwrite_with_bounded(max_steps=max_solver_steps):
        u, _ = jax.jit(lambda p: solve((y0,), p))(params)
    return u


def main(dataset_size=16, batch_size=4, resolution=48, seed=5678,
         lrs=(3e-3, 1e-3, 1e-3, 1e-3), steps=(50, 30, 30, 30),
         lengths=(0.2, 0.4, 0.7, 1.0),
         tol=1e-3, noise_std=1e-2, max_solver_steps=512,
         require_improvement=True):
    # Horizon curriculum (the reference's comment describes 10%-first
    # training, learn_ode.py:39-43): reverse-mode gradients through the
    # adaptive RK solve are non-finite when partially-trained dynamics
    # diverge over the full horizon, so the horizon grows gradually and the
    # best full-data iterate is kept.
    key = jax.random.PRNGKey(seed)
    data_key, model_key = jax.random.split(key)
    ts = jnp.linspace(0.0, 10.0, num=resolution)
    _u0s, ys = make_data(data_key, dataset_size, ts)

    params0 = mlp_init(model_key, (2, 4, 4, 2))
    results, losses = {}, {}
    for mode in ["prob", "rk"]:
        results[mode], losses[mode], (ev0, ev1) = train(
            mode, params0, ts, ys, lrs=lrs, steps=steps, lengths=lengths,
            batch_size=batch_size, tol=tol, noise_std=noise_std,
            max_solver_steps=max_solver_steps, seed=seed,
        )
        if require_improvement:
            assert ev1 < ev0, (mode, ev0, ev1)

    y0 = ys[0, 0]
    plots = {
        "ins": np.asarray(ts),
        "outs": np.asarray(ys[0]),
        "ts": np.asarray(ts),
        "truth": np.asarray(ys[0]),
        "before": np.asarray(fit_curve(params0, ts, y0, max_solver_steps)),
        "pn": np.asarray(fit_curve(results["prob"], ts, y0, max_solver_steps)),
        "rk": np.asarray(fit_curve(results["rk"], ts, y0, max_solver_steps)),
    }
    here = os.path.dirname(__file__)
    np.save(os.path.join(here, "data_losses.npy"),
            {k: np.asarray(v) for k, v in losses.items()}, allow_pickle=True)
    np.save(os.path.join(here, "data_plots.npy"), plots, allow_pickle=True)

    err_before = float(np.mean((plots["before"] - plots["truth"]) ** 2))
    err_pn = float(np.mean((plots["pn"] - plots["truth"]) ** 2))
    err_rk = float(np.mean((plots["rk"] - plots["truth"]) ** 2))
    print(f"fit MSE: before {err_before:.4f}, prob {err_pn:.4f}, rk {err_rk:.4f}")
    if require_improvement:
        assert err_pn < err_before and err_rk < err_before


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset-size", type=int, default=16)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--resolution", type=int, default=48)
    ap.add_argument("--steps", type=int, nargs="+", default=None)
    ap.add_argument("--max-solver-steps", type=int, default=512)
    a = ap.parse_args()
    kwargs = {}
    if a.steps is not None:
        kwargs["steps"] = tuple(a.steps)
    main(dataset_size=a.dataset_size, batch_size=a.batch_size,
         resolution=a.resolution, max_solver_steps=a.max_solver_steps,
         **kwargs)
