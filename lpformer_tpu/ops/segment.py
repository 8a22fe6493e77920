"""Segment / masked reduction ops.

TPU-native equivalents of torch_scatter.scatter and PyG's segment softmax
(reference: src/models/link_transformer.py:371,383; src/modules/layers.py:220).
The primary layout in this framework is *dense bucketed* — per-link context
tables of static shape [B, C] with validity masks — so the hot softmax is a
masked dense softmax (pure VPU work, no scatter at all). Flat ragged
segment variants are provided for the alternative flat layout.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def masked_softmax(
    logits: jnp.ndarray, valid: jnp.ndarray, axis: int = 1
) -> jnp.ndarray:
    """Softmax over ``axis`` restricted to ``valid`` entries.

    Rows with no valid entries produce exactly 0 everywhere (matching the
    reference, where a link with an empty context set receives a zero
    attention output — scatter-of-nothing into zeros).
    """
    masked = jnp.where(valid, logits, _NEG_INF)
    m = jnp.max(masked, axis=axis, keepdims=True)
    # Guard fully-invalid rows: max = -inf would give exp(0)=1 spuriously.
    m = jnp.maximum(m, _NEG_INF / 2)
    e = jnp.exp(masked - m) * valid.astype(logits.dtype)
    denom = jnp.sum(e, axis=axis, keepdims=True)
    return e / jnp.maximum(denom, 1e-16)


def masked_count(valid: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
    """Per-row count of valid entries, as float [B, 1] — the structure
    counts of reference get_count / get_num_ppr_thresh
    (src/models/link_transformer.py:359-386)."""
    return jnp.sum(valid.astype(jnp.float32), axis=axis, keepdims=True)


def segment_softmax(
    logits: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    valid: Optional[jnp.ndarray] = None,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    """Softmax over ragged segments (flat layout). logits: [L] or [L, H]."""
    if valid is not None:
        logits = jnp.where(
            valid if logits.ndim == valid.ndim else valid[:, None],
            logits,
            _NEG_INF,
        )
    seg_max = jax.ops.segment_max(
        logits, seg_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    seg_max = jnp.maximum(seg_max, _NEG_INF / 2)
    e = jnp.exp(logits - seg_max[seg_ids])
    if valid is not None:
        v = valid if logits.ndim == valid.ndim else valid[:, None]
        e = e * v.astype(e.dtype)
    denom = jax.ops.segment_sum(
        e, seg_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
    return e / jnp.maximum(denom[seg_ids], 1e-16)


def segment_sum(
    x: jnp.ndarray,
    seg_ids: jnp.ndarray,
    num_segments: int,
    indices_are_sorted: bool = True,
) -> jnp.ndarray:
    return jax.ops.segment_sum(
        x, seg_ids, num_segments=num_segments,
        indices_are_sorted=indices_are_sorted,
    )
