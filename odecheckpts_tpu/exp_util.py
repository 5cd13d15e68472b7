"""Experiment utilities: descriptor-driven figure styling + pytree sampling.

Covers the capability surface of the reference's experiment utilities
(/root/reference/src/odecheckpts/exp_util.py — plot params, per-algorithm
styles for the two work-precision figures, random pytrees) with a different
architecture: each benchmark label is parsed ONCE into a typed
:class:`AlgorithmSpec`, and every visual attribute (marker, color, zorder,
linestyle, legend text) is a declarative table lookup / formatter on that
spec.  Adding an algorithm family means adding one table row, not editing
five substring if-chains.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Callable, Optional

import jax


# ---------------------------------------------------------------------------
# rcParams helpers


def plot_params() -> dict:
    """Figure-wide rcParams; uses tueplots when available, else a fallback."""
    rc = {
        "markers.fillstyle": "none",
        "figure.constrained_layout.use": True,
        "lines.markeredgewidth": 0.5,
    }
    try:
        from tueplots import axes  # type: ignore

        for group in (
            axes.lines(),
            axes.legend(),
            axes.grid(),
            axes.tick_direction(x="in", y="in"),
        ):
            rc.update(group)
    except ImportError:
        rc.update(
            {
                "axes.grid": True,
                "grid.linestyle": "dotted",
                "xtick.direction": "in",
                "ytick.direction": "in",
            }
        )
    return rc


def fontsize_uniform(base: float) -> dict:
    """One base font size; every derived element scales off the medium/small
    matplotlib relative sizes."""
    rc = {"font.size": base}
    for element, relative in [
        ("axes.labelsize", "medium"),
        ("axes.titlesize", "medium"),
        ("legend.fontsize", "small"),
        ("xtick.labelsize", "small"),
        ("ytick.labelsize", "small"),
    ]:
        rc[element] = relative
    return rc


# ---------------------------------------------------------------------------
# Algorithm descriptors


@dataclasses.dataclass(frozen=True)
class AlgorithmSpec:
    """Structured description of a benchmark algorithm label.

    ``family``: "prob" (probabilistic solver) or "rk" (Runge–Kutta baseline).
    ``name``: the solver name token ("TS0", "Prob", "Bosh3", ...).
    ``order``: the parenthesised derivative/method order, when present.
    ``variant``: the parenthesised execution variant, e.g. "jit loop"
    (checkpointed save_at) or "jit step" (interpolation re-solve).
    """

    family: str
    name: str
    order: Optional[int]
    variant: Optional[str]

    @property
    def order_digit(self) -> Optional[int]:
        """Order for line styling; RK names carry it as a trailing digit
        (Bosh3, Tsit5, Dopri8)."""
        if self.order is not None:
            return self.order
        digits = re.findall(r"\d", self.name)
        return int(digits[-1]) if digits else None


_NAME_RE = re.compile(r"(?P<name>[A-Za-z][A-Za-z0-9]*)\((?P<order>\d*)\)")
_VARIANT_RE = re.compile(r"\((?P<variant>[a-z][^)]*)\)")


def parse_label(label: str) -> AlgorithmSpec:
    """Parse labels like ``"TS0(4) (jit loop) via probabilistic"`` or
    ``"Bosh3() via rk"`` into an :class:`AlgorithmSpec`."""
    m = _NAME_RE.search(label)
    if m is None:
        raise ValueError(f"unrecognised algorithm label: {label!r}")
    order = int(m.group("order")) if m.group("order") else None
    v = _VARIANT_RE.search(label, m.end())
    variant = v.group("variant") if v else None
    lowered = label.lower()
    if "nystrom" in lowered:
        family = "nystrom"
    elif "prob" in lowered or "ts" in lowered:
        family = "prob"
    else:
        family = "rk"
    return AlgorithmSpec(
        family=family, name=m.group("name"), order=order, variant=variant
    )


# ---------------------------------------------------------------------------
# Styles: one table per figure, one Style object facing the plot scripts


@dataclasses.dataclass
class Style:
    """Per-label style accessors (the plot scripts call these with the raw
    benchmark label; resolution goes through :func:`parse_label`)."""

    marker: Callable[[str], str]
    label: Callable[[str], str]
    color: Callable[[str], str]
    linestyle: Callable[[str], str]
    alpha_line: Optional[Callable[[str], float]]
    alpha_fill_between: Callable[[str], float]
    zorder: Callable[[str], int]


#: order digit -> linestyle, shared by both work-precision figures: low-order
#: methods dotted, mid-order solid, high-order dashed.
LINESTYLE_BY_ORDER = {
    2: "dotted",
    3: "dotted",
    4: "solid",
    5: "solid",
    7: "dashed",
    8: "dashed",
}


def _linestyle(spec: AlgorithmSpec) -> str:
    try:
        return LINESTYLE_BY_ORDER[spec.order_digit]
    except KeyError:
        raise ValueError(f"no linestyle for order {spec.order_digit!r}") from None


def _style_from_tables(
    key_of: Callable[[AlgorithmSpec], object],
    tables: dict,
    legend: Callable[[AlgorithmSpec], str],
    *,
    alpha_line: Optional[float] = None,
) -> Style:
    def lookup(attribute):
        table = tables[attribute]

        def get(label: str, /):
            spec = parse_label(label)
            try:
                return table[key_of(spec)]
            except KeyError:
                raise ValueError(
                    f"no {attribute} entry for {label!r} (key {key_of(spec)!r})"
                ) from None

        return get

    return Style(
        marker=lookup("marker"),
        color=lookup("color"),
        zorder=lookup("zorder"),
        linestyle=lambda s, /: _linestyle(parse_label(s)),
        label=lambda s, /: legend(parse_label(s)),
        alpha_line=None if alpha_line is None else (lambda _s, /: alpha_line),
        alpha_fill_between=lambda _s, /: 0.0,
    )


def style_simple() -> Style:
    """Experiment-2 figure: distinguish execution variants of the
    probabilistic solver (checkpoint "jit loop" vs interpolation "jit step")
    from the RK baselines."""

    def key(spec: AlgorithmSpec):
        if spec.family == "rk":
            return "rk"
        return "loop" if "loop" in (spec.variant or "") else "step"

    tables = {
        "marker": {"loop": "o", "step": "^", "rk": "s"},
        "color": {"loop": "C0", "step": "C1", "rk": "C2"},
        "zorder": {"loop": 2, "step": 1, "rk": 0},
    }

    def legend(spec: AlgorithmSpec) -> str:
        if spec.family == "rk":
            return f"RK: {spec.name}"
        suffix = "; ours" if "loop" in (spec.variant or "") else ""
        return f"Prob({spec.order}) ({spec.variant}{suffix})"

    return _style_from_tables(key, tables, legend, alpha_line=0.99)


def style_harder() -> Style:
    """Experiment-3 figure: probabilistic solvers vs RK baselines, orders
    separated by linestyle only."""

    tables = {
        "marker": {"prob": "o", "rk": "P", "nystrom": "D"},
        "color": {"prob": "C0", "rk": "C2", "nystrom": "C3"},
        "zorder": {"prob": 1, "rk": 0, "nystrom": 0},
    }

    def legend(spec: AlgorithmSpec) -> str:
        if spec.family == "rk":
            return f"RK: {spec.name}"
        if spec.family == "nystrom":
            return f"Nystrom: {spec.name}"
        return f"{spec.name}({spec.order}; ours)"

    return _style_from_tables(lambda spec: spec.family, tables, legend)


# ---------------------------------------------------------------------------
# Random pytrees


def tree_random_like(key, tree):
    """Standard-normal sample with the structure/shapes/dtypes of ``tree``.

    Implemented leaf-wise with split keys (not via ravel_pytree), so the
    sample for one leaf does not depend on the sizes of the other leaves.
    """
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    samples = [
        jax.random.normal(k, shape=leaf.shape, dtype=leaf.dtype)
        for k, leaf in zip(keys, leaves)
    ]
    return jax.tree.unflatten(treedef, samples)
