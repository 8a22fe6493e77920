"""Result analysis: performance binned by common-neighbor count.

The reference ships a broken/abandoned version of this
(reference: src/train/eval.py — `test_by_metric` contains bare `...`
placeholders and is imported nowhere). This is the working equivalent:
per-sample Hits/ranks grouped by each test edge's CN count.
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np

import jax

from lpformer_tpu.data.dataset import LinkPredDataset
from lpformer_tpu.evalx import harness, metrics
from lpformer_tpu.models import link_transformer as lt
from lpformer_tpu.ops.context import ContextConfig, extract_context


def compute_edge_cn(
    ds: LinkPredDataset,
    edges: np.ndarray,
    batch_size: int = 8192,
    test_set: bool = True,
) -> np.ndarray:
    """CN count per edge (reference eval.py:21-42 intent, working)."""
    g = ds.graph_test if test_set else ds.graph
    cfg = ContextConfig(
        mask_mode="cn", budget_cn=1, budget_onehop=1, budget_non1hop=1
    )
    out = np.empty(len(edges), np.float32)
    for lo in range(0, len(edges), batch_size):
        hi = min(lo + batch_size, len(edges))
        chunk = edges[lo:hi]
        ctx = extract_context(
            g.adj_rows, g.ppr_rows,
            jnp.asarray(chunk[:, 0]), jnp.asarray(chunk[:, 1]), cfg,
        )
        out[lo:hi] = np.asarray(ctx.counts)[:, 0]
    return out


def test_by_cn_bins(
    params,
    cfg,
    ds: LinkPredDataset,
    batch_size: int = 32768,
    bins: Sequence[float] = (0, 1, 2, 5, 10, float("inf")),
    k: int = 100,
) -> Dict[str, Dict[str, float]]:
    """Per-CN-bin Hits@k of test positives vs the shared test negatives."""
    score_fn = harness._score_fn(cfg)
    prop = harness._propagate_fn(cfg)
    X = prop(params, ds.graph_test)
    pos = harness.score_edges(
        score_fn, params, ds.graph_test, X, np.asarray(ds.test_pos),
        batch_size,
    )
    neg = harness.score_edges(
        score_fn, params, ds.graph_test, X, np.asarray(ds.test_neg),
        batch_size,
    )
    cn = compute_edge_cn(ds, np.asarray(ds.test_pos))

    out = {}
    neg_sorted = jnp.sort(jnp.asarray(neg))  # once, not per bin
    for lo, hi in zip(bins[:-1], bins[1:]):
        m = (cn >= lo) & (cn < hi)
        if m.sum() == 0:
            continue
        hit = float(metrics.evaluate_hits_single(
            jnp.asarray(pos[m]), neg_sorted, k, neg_sorted=True
        ))
        out[f"cn[{lo},{hi})"] = {
            "n": int(m.sum()),
            f"Hits@{k}": hit,
        }
    return out


def attention_weights(
    params,
    cfg,
    ds: LinkPredDataset,
    edges: np.ndarray,
    test_set: bool = False,
):
    """Per-link attention weights over context nodes — the ``--dump-att``
    debugging affordance (reference: src/run.py:193, layers.py:69-75).

    Returns (ids [B, C], valid [B, C], alpha [B, C] mean over heads).
    """
    g = ds.graph_test if test_set else ds.graph
    X = harness._propagate_fn(cfg)(params, g)
    src = jnp.asarray(edges[:, 0])
    tgt = jnp.asarray(edges[:, 1])
    ctx = extract_context(g.adj_rows, g.ppr_rows, src, tgt, cfg.context)
    _, alpha = lt.calc_pairwise(
        params, cfg, X, src, tgt, ctx, train=False, return_weights=True
    )
    return (
        np.asarray(ctx.ids),
        np.asarray(ctx.valid),
        np.asarray(alpha.mean(axis=-1)),
    )
