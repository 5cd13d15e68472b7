"""Training-state checkpoint/resume (aux subsystem; goes beyond the reference).

The reference persists only experiment RESULTS (`.npy` per experiment,
e.g. /root/reference/experiments/4_brusselator/run.py); interrupted training
loops lose their optimizer state.  This module adds durable training-state
checkpoints so :func:`odecheckpts_tpu.train.fit` can resume mid-run:

* storage via orbax-checkpoint's synchronous ``PyTreeCheckpointer`` — the
  async ``CheckpointManager`` spawns a coordination thread that deadlocks
  against this environment's experimental TPU-relay platform, so step
  management (latest-step discovery, ``max_to_keep`` pruning, atomicity via
  orbax's tmp-dir+rename protocol) lives here instead;
* the checkpoint is a plain pytree ``{"theta", "opt_state", "losses"}``;
  any optax optimizer state round-trips;
* :func:`latest_step` / :func:`restore` discover and reload the newest step
  so callers need no bookkeeping of their own.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any, Optional

_STEP_RE = re.compile(r"^step_(\d+)$")


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _step_dirs(directory) -> list[tuple[int, pathlib.Path]]:
    directory = pathlib.Path(directory)
    if not directory.is_dir():
        return []
    out = []
    for child in directory.iterdir():
        m = _STEP_RE.match(child.name)
        if m and child.is_dir():
            out.append((int(m.group(1)), child))
    return sorted(out)


def latest_step(directory) -> Optional[int]:
    """Largest committed step number under ``directory``, or None."""
    steps = _step_dirs(directory)
    return steps[-1][0] if steps else None


def save(directory, step: int, state: Any, *, max_to_keep: Optional[int] = 3):
    """Write ``state`` (any pytree) as step ``step``; prune old steps.

    Orbax writes into a temporary directory and renames on success, so a
    crash mid-save never corrupts the latest committed checkpoint.
    """
    directory = pathlib.Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    path = directory / f"step_{step}"
    _checkpointer().save(path, state, force=True)
    if max_to_keep is not None:
        import shutil

        steps = _step_dirs(directory)
        for _n, old in steps[: max(0, len(steps) - max_to_keep)]:
            shutil.rmtree(old, ignore_errors=True)
    return path


def restore(directory, step: Optional[int] = None) -> Optional[dict]:
    """Load step ``step`` (default: latest).  Returns None if nothing saved."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            return None
    path = pathlib.Path(directory) / f"step_{step}"
    state = _checkpointer().restore(path)
    state["step"] = step
    return state
