"""Batched sorted-row binary search — the workhorse of context extraction.

rows [B, K] sorted ascending per row; queries [B, Q]. Returns found mask
and the clipped insertion position. This is the TPU replacement for the
reference's sparse index_select + coalesce membership machinery: O(log K)
vectorized compare-and-gather instead of dynamic sparse algebra.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def row_search(
    rows: jnp.ndarray, queries: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    pos = jax.vmap(lambda r, q: jnp.searchsorted(r, q, side="left"))(
        rows, queries
    )
    pos_c = jnp.clip(pos, 0, rows.shape[1] - 1)
    found = jnp.take_along_axis(rows, pos_c, axis=1) == queries
    return found, pos_c


def row_lookup(
    rows: jnp.ndarray,
    vals: jnp.ndarray,
    queries: jnp.ndarray,
    default,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(found, value-or-default) for each query."""
    found, pos = row_search(rows, queries)
    v = jnp.take_along_axis(vals, pos, axis=1)
    return found, jnp.where(found, v, default)
