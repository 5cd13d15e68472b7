"""Experiment utilities: figure styling and pytree random sampling.

Parity with /root/reference/src/odecheckpts/exp_util.py (plot_params:8,
fontsize_uniform:24, Style:35, style_harder:46, style_simple:102,
tree_random_like:174).  The tueplots dependency is optional: the style dicts
fall back to plain matplotlib rcParams when it is absent.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.flatten_util


def plot_params():
    try:
        from tueplots import axes  # type: ignore

        extra = {
            **axes.lines(),
            **axes.legend(),
            **axes.grid(),
            **axes.tick_direction(x="in", y="in"),
        }
    except ImportError:
        extra = {
            "axes.grid": True,
            "grid.linestyle": "dotted",
            "xtick.direction": "in",
            "ytick.direction": "in",
        }
    return {
        "markers.fillstyle": "none",
        "figure.constrained_layout.use": True,
        "lines.markeredgewidth": 0.5,
        **extra,
    }


def fontsize_uniform(base):
    return {
        "font.size": base,
        "axes.labelsize": "medium",
        "axes.titlesize": "medium",
        "legend.fontsize": "small",
        "xtick.labelsize": "small",
        "ytick.labelsize": "small",
    }


@dataclasses.dataclass
class Style:
    marker: Callable[[str], str]
    label: Callable[[str], str]
    color: Callable[[str], str]
    linestyle: Callable[[str], str]
    alpha_line: Optional[Callable[[str], float]]
    alpha_fill_between: Callable[[str], float]
    zorder: Callable[[str], int]


def style_harder():
    """Per-algorithm styling keyed by substrings of the algorithm label."""

    def label(string, /):
        string = string.replace("()", "")
        string = string.replace(" via probabilistic", "")
        string = string.replace(" via rk", "")
        if "rob" in string:
            string = string.replace(")", "; ours)")
        else:
            string = f"RK: {string}"
        return string

    def marker(string, /):
        if "rk" in string.lower():
            return "P"
        if "prob" in string.lower():
            return "o"

    def linestyle(string, /):
        if "2" in string.lower() or "3" in string.lower():
            return "dotted"
        if "4" in string.lower() or "5" in string.lower():
            return "solid"
        if "7" in string.lower() or "8" in string.lower():
            return "dashed"
        raise ValueError(string)

    def color(string, /):
        if "prob" in string.lower():
            return "C0"
        if "rk" in string.lower():
            return "C2"
        raise ValueError(string)

    def zorder(string, /):
        if "prob" in string.lower():
            return 1
        if "rk" in string.lower():
            return 0
        raise ValueError(string)

    return Style(
        marker=marker,
        label=label,
        color=color,
        linestyle=linestyle,
        alpha_line=None,
        alpha_fill_between=lambda _s: 0.0,
        zorder=zorder,
    )


def style_simple():
    def marker(string, /):
        if "step" in string.lower():
            return "^"
        if "loop" in string.lower():
            return "o"
        if "rk" in string.lower():
            return "s"
        raise ValueError(string)

    def color(string, /):
        if "loop" in string.lower():
            return "C0"
        if "step" in string.lower():
            return "C1"
        if "rk" in string.lower():
            return "C2"
        raise ValueError(string)

    def zorder(string, /):
        if "step" in string.lower():
            return 1
        if "loop" in string.lower():
            return 2
        if "rk" in string.lower():
            return 0
        raise ValueError(string)

    def label(string, /):
        string = string.replace("()", "")
        string = string.replace("via probabilistic", "")
        if "rk" in string:
            string = string.replace("via rk", "")
            string = f"RK: {string}"
        if "TS" in string:
            string = string.replace("TS0", "Prob")
        if "loop" in string:
            string = string.replace("loop)", "loop; ours)")
        return string

    def linestyle(string, /):
        for ch in "23":
            if ch in string.lower():
                return "dotted"
        for ch in "45":
            if ch in string.lower():
                return "solid"
        raise ValueError(string)

    return Style(
        marker=marker,
        label=label,
        color=color,
        alpha_fill_between=lambda _s: 0.0,
        linestyle=linestyle,
        alpha_line=lambda _s: 0.99,
        zorder=zorder,
    )


def tree_random_like(key, tree):
    """Standard-normal sample shaped like an arbitrary pytree (reference :174)."""
    flat, unflatten = jax.flatten_util.ravel_pytree(tree)
    flat = jax.random.normal(key, shape=flat.shape, dtype=flat.dtype)
    return unflatten(flat)
