"""Debug utilities: NaN checks and finite-tree assertions behind a flag.

SURVEY §5: the reference has no sanitizers; this provides the planned
``jax.debug`` NaN checks.
"""
from __future__ import annotations

import os


def nan_checks_enabled() -> bool:
    return bool(os.environ.get("LPFORMER_TPU_DEBUG_NANS"))


def enable_nan_checks():
    """Global jit-level NaN detection (recompiles with checks)."""
    import jax

    jax.config.update("jax_debug_nans", True)


def assert_tree_finite(tree, name: str = "tree"):
    """Host-side finite check over a pytree (call outside jit)."""
    import jax
    import numpy as np

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        a = np.asarray(leaf)
        if a.dtype.kind == "f" and not np.isfinite(a).all():
            raise FloatingPointError(
                f"non-finite values in {name}{jax.tree_util.keystr(path)}"
            )


def debug_check_finite(x, label: str = "x"):
    """In-jit finite check via jax.debug (no-op unless env flag set)."""
    if not nan_checks_enabled():
        return x
    import jax
    import jax.numpy as jnp

    bad = jnp.logical_not(jnp.all(jnp.isfinite(x)))
    jax.debug.print(
        "NaN-check {label}: non_finite={bad}", label=label, bad=bad
    )
    return x
