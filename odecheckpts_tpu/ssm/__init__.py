"""SSM backends: isotropic / dense (+ blockdiag) square-root factorizations."""

from .base import Conditional, MarkovSeq, Normal, Solution  # noqa: F401
from .blockdiag import BlockDiagSSM  # noqa: F401
from .dense import DenseSSM  # noqa: F401
from .isotropic import IsotropicSSM  # noqa: F401

_REGISTRY = {
    "isotropic": IsotropicSSM,
    "dense": DenseSSM,
    "blockdiag": BlockDiagSSM,
    # probdiffeq's "scalar" factorization is the d=1 special case of the
    # per-dimension backend (SURVEY.md section 2: shipped but not exercised
    # by the reference experiments)
    "scalar": BlockDiagSSM,
}


def choose(implementation: str, *, ode_shape: tuple, num_derivatives: int):
    """Value-returning replacement for probdiffeq's global ``impl.select``.

    (Reference call site: /root/reference/src/odecheckpts/ivpsolvers.py:33.)
    """
    try:
        cls = _REGISTRY[implementation]
    except KeyError:
        raise ValueError(
            f"unknown implementation {implementation!r}; "
            f"available: {sorted(_REGISTRY)}"
        ) from None
    return cls(num_derivatives=num_derivatives, ode_shape=tuple(ode_shape))


def register(name: str, cls) -> None:
    _REGISTRY[name] = cls
