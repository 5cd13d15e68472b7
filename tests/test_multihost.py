"""Multi-process distributed init, end-to-end on CPU (ROADMAP #11).

Two local processes stand in for two hosts: ``jax.distributed.initialize``
via ``parallel.init_distributed``, a mesh over both processes' devices, and
a sharded fused solve on a global array (gloo CPU collectives).  Real-DCN
behavior remains untested here by nature of the environment.
"""

import pathlib
import subprocess
import sys

import pytest

_DEMO = (
    pathlib.Path(__file__).resolve().parents[1]
    / "experiments"
    / "multihost_demo.py"
)


@pytest.mark.slow
def test_two_process_distributed_demo():
    proc = subprocess.run(
        [sys.executable, str(_DEMO), "--num-processes", "2"],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "ALL OK" in proc.stdout


def test_init_distributed_single_host_path():
    """Without kwargs or the env flag, init_distributed must skip the
    distributed runtime and return a local-device mesh."""
    from odecheckpts_tpu import parallel

    mesh = parallel.init_distributed()
    import jax

    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("batch",)
