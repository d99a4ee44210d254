"""Numerical-debug helpers (SURVEY.md §5: "jax.debug NaN checks +
checkify for bounds").

Usage:
  loss, err = checked_loss_fn(params, batch)   # checkify-wrapped
  train_step = guard_nans(train_step)          # raises on non-finite output
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


def guard_nans(fn: Callable, name: str = "fn") -> Callable:
    """Wrap `fn` so every float output is checked finite via checkify.
    Returns (error, outputs); call error.throw() on host to surface."""

    def wrapped(*args, **kwargs):
        def inner(*a, **k):
            out = fn(*a, **k)
            for i, leaf in enumerate(jax.tree.leaves(out)):
                if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
                    checkify.check(
                        jnp.all(jnp.isfinite(leaf)),
                        f"{name}: non-finite value in output leaf {i}",
                    )
            return out

        return checkify.checkify(inner)(*args, **kwargs)

    return wrapped


def tree_nan_report(tree: Any) -> dict:
    """Host-side: map of leaf-path -> count of non-finite entries (only
    non-zero entries included)."""
    import numpy as np

    report = {}

    def visit(path, leaf):
        arr = np.asarray(leaf)
        if np.issubdtype(arr.dtype, np.floating):
            bad = int((~np.isfinite(arr)).sum())
            if bad:
                report[jax.tree_util.keystr(path)] = bad

    jax.tree_util.tree_map_with_path(visit, tree)
    return report
