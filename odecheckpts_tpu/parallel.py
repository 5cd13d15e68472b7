"""Batched and multi-chip parallel IVP solving.

The reference is single-process/single-device (SURVEY.md section 2: no pmap/
pjit/mesh anywhere); its only batching is a ``jax.vmap`` over dataset
elements.  The TPU rebuild promotes parallelism to a first-class subsystem:

* ``build_batched_solve`` -- one compiled program that solves an ensemble of
  IVPs x tolerances via ``vmap`` (lanes mask their finished adaptive loops);
  this is the ">= 10x CPU throughput on vmapped 1k-IVP sweeps" target from
  BASELINE.json.
* ``shard_batched_solve`` -- the same program laid out over a 1-D device mesh
  with ``jax.shard_map``: IVP batches are embarrassingly parallel, so the only
  communication is the result gather XLA inserts at the output sharding
  boundary (rides ICI).
* ``build_dp_train_step`` -- data-parallel parameter-estimation step: each
  device computes the negative log-marginal-likelihood gradient on its IVP
  shard, gradients are combined with one ``psum``, and an optax update is
  applied replicated.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import facade, stats


def init_distributed(**kwargs):
    """Multi-host entry point: initialize the JAX distributed runtime and
    return a 1-D mesh over ALL hosts' devices.

    On a multi-host TPU slice, call this once per process before building
    solvers; every ``shard_*`` builder in this module then lays batches out
    across the full slice (the data-parallel axis is embarrassingly
    parallel, so cross-host traffic is only the output gather).  On a
    single-host setup (no coordinator configured and no cluster environment
    detected) the distributed init is skipped and the mesh covers the local
    devices -- so driver scripts run unchanged in both settings.

    ``kwargs`` forward to ``jax.distributed.initialize``
    (coordinator_address, num_processes, process_id, ...).
    """
    # opt-in: single-chip relay environments leak TPU_* cluster variables,
    # so auto-detection misfires; require explicit kwargs or the env flag
    if kwargs or os.environ.get("ODECKPT_DISTRIBUTED") == "1":
        jax.distributed.initialize(**kwargs)
    import numpy as np

    return Mesh(np.array(jax.devices()), ("batch",))


def build_batched_solve(
    method: str,
    vf,
    u0_like,
    save_at,
    *,
    dt0,
    ode_order: int = 1,
    calibrate: str = "dynamic",
    implementation: str = "isotropic",
    atol_factor: float = 1e-3,
):
    """Return ``solve_batch(u0_tuple_batched, params, tols) -> (u, num_steps)``.

    ``u0_tuple_batched``: tuple of arrays with a leading batch axis;
    ``tols``: (batch,) relative tolerances (atol = atol_factor * rtol, the
    reference's convention: run_simple.py:40-42).  The returned function is
    jittable and vmap-composable; batch members run the adaptive loop in
    lockstep with per-lane masking.
    """

    def solve_one(u0, p, tol):
        fun = facade.solve(
            method,
            vf,
            u0_like,
            save_at,
            dt0=dt0,
            atol=atol_factor * tol,
            rtol=tol,
            ode_order=ode_order,
            calibrate=calibrate,
            implementation=implementation,
        )
        u, aux = fun(u0, p)
        return u, aux["solution"].num_steps[-1]

    return jax.vmap(solve_one, in_axes=(0, None, 0))


def shard_batched_solve(solve_batch, mesh: Mesh, axis: str = "batch"):
    """Lay a batched solve out over a 1-D device mesh.

    The batch axis is sharded; parameters are replicated.  Inside each shard
    the computation is the plain vmapped solve -- no collectives are needed
    until XLA gathers the output.
    """

    def sharded(u0s, params, tols):
        return jax.shard_map(
            lambda u, t: solve_batch(u, params, t),
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )(u0s, tols)

    return jax.jit(sharded)


def shard_engine_solve(solve_local, mesh: Mesh, axis: str = "batch"):
    """Lay ANY batched engine ``solve_local(u0s, tols) -> outputs`` over a
    1-D device mesh, handling batches that do NOT divide the mesh size.

    Uneven batches are padded up to the next mesh multiple by replicating the
    loosest-tolerance lane (the same admission trick the fused engines use
    internally for their lane tiles), the shard_map runs on the even batch,
    and every output leaf is sliced back to the caller's size.  ``u0s`` may
    be a single array or a tuple (``ode_order=2``); all outputs must carry
    the batch on their leading axis (true of every ``batched*`` engine).
    """
    n = mesh.shape[axis]

    def sharded(u0s, tols):
        is_tuple = isinstance(u0s, tuple)
        u_tuple = u0s if is_tuple else (u0s,)
        b = u_tuple[0].shape[0]
        pad = (-b) % n
        if pad:
            loosest = jnp.argmax(tols)

            def rep(u):
                row = jax.lax.dynamic_slice_in_dim(u, loosest, 1, axis=0)
                reps = (pad,) + (1,) * (u.ndim - 1)
                return jnp.concatenate([u, jnp.tile(row, reps)])

            u_tuple = tuple(rep(u) for u in u_tuple)
            tols = jnp.concatenate(
                [tols, jnp.broadcast_to(tols[loosest], (pad,))]
            )
        out = jax.shard_map(
            solve_local,
            mesh=mesh,
            in_specs=(P(axis), P(axis)),
            out_specs=P(axis),
            check_vma=False,
        )(u_tuple if is_tuple else u_tuple[0], tols)
        if pad:
            out = jax.tree.map(lambda x: x[:b], out)
        return out

    return jax.jit(sharded)


def shard_fused_solve(vf, params, *, save_at, dt0, mesh: Mesh, axis: str = "batch", **solve_kwargs):
    """The FUSED batched engine (batched.solve_save_at_batched) laid out over
    a 1-D device mesh: each shard runs the lanes-last fused step kernel on its
    local sub-batch; no collectives until XLA gathers the outputs.

    ``solve_kwargs`` forward to the fused solver (engine, tols dtype rules,
    ode_order, lanes, ...).  The HBM admission guard applies per shard.
    Returns ``sharded(u0s, tols) -> (u_smoothed, u_filtered, num_steps)``;
    batches that don't divide the mesh are padded per ``shard_engine_solve``.
    """
    from . import batched

    def local(u, t):
        return batched.solve_save_at_batched(
            vf, u, params, save_at=save_at, dt0=dt0, tols=t, **solve_kwargs
        )

    return shard_engine_solve(local, mesh, axis)


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated over every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_along(tree, mesh: Mesh, axis: str = "batch"):
    """Shard the leading axis of every leaf across the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def build_dp_train_step(
    method: str,
    vf,
    u0_like,
    save_at,
    *,
    dt0,
    atol,
    rtol,
    optimizer,
    mesh: Mesh,
    axis: str = "dp",
    obs_std: float = 1e-2,
):
    """Data-parallel training step over an IVP ensemble on a device mesh.

    Returns ``step(params, opt_state, u0_batch, y_batch) -> (params,
    opt_state, loss)`` where ``u0_batch``/(batch, ...) and ``y_batch``/(batch,
    #save_at, d) are sharded along ``axis`` and the fitted vector-field
    parameters are replicated.  Gradients are averaged with one ``psum``
    (lax collective over ICI) -- the TPU-native counterpart of the
    reference's single-device training loops (SURVEY.md C11).
    """
    solve = facade.solve(
        method, vf, u0_like, save_at, dt0=dt0, atol=atol, rtol=rtol, calibrate="none"
    )

    def local_loss(params, u0_local, y_local):
        def one(u0, y):
            _u, aux = solve((u0,), params)
            return -stats.log_marginal_likelihood(
                y,
                standard_deviation=obs_std * jnp.ones(len(save_at)),
                posterior=aux["solution"].posterior,
            )

        return jnp.sum(jax.vmap(one)(u0_local, y_local))

    def step(params, opt_state, u0_batch, y_batch):
        def shard_fn(params, u0_local, y_local):
            loss, grads = jax.value_and_grad(local_loss)(params, u0_local, y_local)
            loss = jax.lax.psum(loss, axis)
            grads = jax.lax.psum(grads, axis)
            return loss, grads

        loss, grads = jax.shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )(params, u0_batch, y_batch)
        updates, opt_state = optimizer.update(grads, opt_state)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss

    return jax.jit(step)


def workprec_batched(solve_batch, u0s, params, tols):
    """Run a batched sweep once and report throughput-oriented metrics."""
    import time

    from . import harness

    u, steps = solve_batch(u0s, params, tols)
    harness.device_sync(u)
    t0 = time.perf_counter()
    u, steps = solve_batch(u0s, params, tols)
    harness.device_sync(u)
    elapsed = time.perf_counter() - t0
    batch = jax.tree.leaves(tols)[0].shape[0]
    return {
        "batch": batch,
        "wall_s": elapsed,
        "solves_per_s": batch / elapsed,
        "total_steps": int(jnp.sum(steps)),
        "u": u,
    }
