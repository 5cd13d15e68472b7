"""odecheckpts_tpu: TPU-native adaptive probabilistic ODE solvers.

A from-scratch JAX/XLA/Pallas re-design of the capability surface exercised by
pnkraemer/code-adaptive-prob-ode-solvers (the experiment repository for
"Adaptive Probabilistic ODE Solvers Without Adaptive Memory Requirements") and
the probdiffeq-style solver stack it calls into.  See SURVEY.md for the layer
map and parity anchors.

Module tour (import-parity with the reference stack where applicable):

    ivpsolvers    priors, corrections, strategies, calibration
    ivpsolve      adaptive/fixed-grid solve drivers, PI control
    taylor        Taylor-mode (jet) initialization
    stats         posterior marginals, sampling, likelihoods, off-grid output
    ssm           state-space backends: isotropic / dense (value-based "impl")
    problems      IVP zoo
    facade        two-stage solve builders (reference layer L2)
    rk            native adaptive Runge-Kutta baselines (diffrax stand-ins)
    train         loss/update builders for ODE parameter estimation
    checkpointing durable training-state save/resume (orbax-backed)
    parallel      batched sweeps on device meshes (vmap + shard_map)
    parallel_time parallel-in-time forward filter (cov + sqrt elements)
    batched       fused lanes-last adaptive engine (one Pallas step kernel)
    batched_hi    df32 tight-tolerance engine + precision-routed driver
    df32          compensated (hi, lo) two-float arithmetic for kernels
    control_flow  overridable / bounded while-loop (reverse-mode AD support)
"""

from . import batched  # noqa: F401
from . import batched_hi  # noqa: F401
from . import df32  # noqa: F401

from . import checkpointing  # noqa: F401
from . import control_flow  # noqa: F401
from . import exp_util  # noqa: F401
from . import facade  # noqa: F401
from . import harness  # noqa: F401
from . import ivpsolve  # noqa: F401
from . import ivpsolvers  # noqa: F401
from . import linalg  # noqa: F401
from . import parallel  # noqa: F401
from . import parallel_time  # noqa: F401
from . import prior  # noqa: F401
from . import problems  # noqa: F401
from . import rk  # noqa: F401
from . import ssm  # noqa: F401
from . import stats  # noqa: F401
from . import taylor  # noqa: F401
from . import train  # noqa: F401

__version__ = "0.1.0"
