"""Multi-host (multi-process) distributed demo: ``parallel.init_distributed``
end-to-end on CPU.

The reference has no distributed code at all (SURVEY.md section 2); this
exercises the TPU-native multi-host path — ``jax.distributed.initialize`` +
a mesh spanning every process's devices + the sharded fused solver — with
two local processes standing in for two hosts (gloo CPU collectives), so the
multi-host wiring is tested without a real multi-host TPU slice.

Run: ``python experiments/multihost_demo.py`` (parent spawns the workers).
"""

import argparse
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]


def worker(coordinator: str, num_processes: int, process_id: int) -> None:
    sys.path.insert(0, str(REPO))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from odecheckpts_tpu import parallel, problems

    mesh = parallel.init_distributed(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == num_processes * n_local, (n_global, n_local)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    vf, (u0,), tspan, params = problems.rigid_body()
    save_at = jnp.linspace(*tspan, num=3, dtype=jnp.float32)
    solve = parallel.shard_fused_solve(
        vf, params, save_at=save_at, dt0=0.1, mesh=mesh, axis="batch",
        engine="xla",
    )

    # global batch sharded over every process's devices: per-process local
    # rows are assembled into one global array (the multi-host input idiom)
    batch = 2 * n_global
    rows_local = np.tile(np.asarray(u0, np.float32)[None], (2 * n_local, 1))
    rows_local *= 1.0 + 0.01 * process_id
    tols_local = np.full((2 * n_local,), 1e-3, np.float32)
    sharding = NamedSharding(mesh, P("batch"))
    u0s = jax.make_array_from_process_local_data(sharding, rows_local, (batch, 3))
    tols = jax.make_array_from_process_local_data(sharding, tols_local, (batch,))

    u_s, _u_f, n_steps = solve(u0s, tols)
    jax.block_until_ready(u_s)
    for shard in u_s.addressable_shards:
        assert np.all(np.isfinite(np.asarray(shard.data))), "non-finite shard"
    print(
        f"process {process_id}/{num_processes}: {n_local} local / {n_global} "
        f"global devices, sharded fused solve ok",
        flush=True,
    )


def parent(num_processes: int, devices_per_process: int) -> None:
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_process}"
    )
    procs = [
        subprocess.Popen(
            [
                sys.executable, __file__, "--worker",
                "--coordinator", coordinator,
                "--num-processes", str(num_processes),
                "--process-id", str(i),
            ],
            env=env,
            cwd=str(REPO),
        )
        for i in range(num_processes)
    ]
    codes = [p.wait(timeout=900) for p in procs]
    if any(codes):
        raise SystemExit(f"worker exit codes: {codes}")
    print(f"ALL OK: {num_processes} processes x {devices_per_process} devices")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=0)
    ap.add_argument("--devices-per-process", type=int, default=2)
    args = ap.parse_args()
    if args.worker:
        worker(args.coordinator, args.num_processes, args.process_id)
    else:
        parent(args.num_processes, args.devices_per_process)
