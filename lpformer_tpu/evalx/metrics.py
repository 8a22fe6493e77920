"""Link-prediction metrics, on-device, with OGB Evaluator semantics.

The reference delegates Hits@K to ``ogb.linkproppred.Evaluator`` and
implements rank-based MRR itself (reference: src/train/evaluation.py).
ogb is not a dependency here; both metrics are implemented from their
definitions and unit-tested against naive numpy oracles:

  * Hits@K (ogb `eval_hits`): fraction of positives scored strictly above
    the K-th highest negative score. If there are fewer than K negatives,
    hits = 1.0 (ogb behavior).
  * MRR: rank = 0.5 * (optimistic + pessimistic) + 1 over a negative set
    per positive (reference: evaluation.py:23-50).
"""
from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp


def evaluate_hits_single(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray, k: int,
    neg_sorted: bool = False,
) -> jnp.ndarray:
    """Hits@K with a shared negative set (OGB eval_hits semantics).

    ``neg_sorted``: pass True when ``neg_pred`` is already ascending —
    the citation2-size negative array (1e8 entries) is sorted ONCE by
    the callers below and indexed per K, instead of re-sorted per K."""
    if neg_pred.shape[0] < k:
        return jnp.asarray(1.0)
    kth = neg_pred[-k] if neg_sorted else jnp.sort(neg_pred)[-k]
    return jnp.mean((pos_pred > kth).astype(jnp.float32))


def evaluate_hits(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray, k_list: Sequence[int]
) -> Dict[str, float]:
    """(reference: evaluation.py:7-18)"""
    neg_sorted = jnp.sort(neg_pred)
    return {
        f"Hits@{k}": float(
            evaluate_hits_single(pos_pred, neg_sorted, k, neg_sorted=True)
        )
        for k in k_list
    }


def mrr_ranks(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray
) -> jnp.ndarray:
    """ranking_list = 0.5*(optimistic + pessimistic) + 1
    (reference: evaluation.py:29-37). pos [P], neg [P, K]."""
    pos = pos_pred.reshape(-1, 1)
    optimistic = jnp.sum(neg_pred >= pos, axis=1)
    pessimistic = jnp.sum(neg_pred > pos, axis=1)
    return 0.5 * (optimistic + pessimistic).astype(jnp.float32) + 1.0


def mrr_ranks_shared(
    pos_pred: jnp.ndarray, neg_sorted: jnp.ndarray
) -> jnp.ndarray:
    """``mrr_ranks`` against ONE shared negative set, without the dense
    [P, K] broadcast (collab-scale P·K is tens of GB): with negatives
    sorted ascending, #neg >= p and #neg > p are searchsorted counts.
    ``neg_sorted`` [K] must be pre-sorted ascending."""
    k = neg_sorted.shape[0]
    optimistic = k - jnp.searchsorted(neg_sorted, pos_pred, side="left")
    pessimistic = k - jnp.searchsorted(neg_sorted, pos_pred, side="right")
    return 0.5 * (optimistic + pessimistic).astype(jnp.float32) + 1.0


def evaluate_mrr(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray
) -> Dict[str, float]:
    """(reference: evaluation.py:23-50). neg_pred [P, K] per-positive."""
    ranks = mrr_ranks(pos_pred, neg_pred)
    out = {
        f"Hits@{k}": float(jnp.mean((ranks <= k).astype(jnp.float32)))
        for k in (10, 50, 100)
    }
    out["MRR"] = float(jnp.mean(1.0 / ranks))
    return out


def sample_level_hits(
    pos_pred: jnp.ndarray, neg_pred: jnp.ndarray
) -> Dict[str, jnp.ndarray]:
    """Per-sample hit indicators (reference: evaluation.py:53-71)."""
    if neg_pred.ndim == 1:  # shared negatives: rank via one sort
        ranks = mrr_ranks_shared(pos_pred, jnp.sort(neg_pred))
    else:
        ranks = mrr_ranks(pos_pred, neg_pred)
    return {
        f"Hits@{k}": (ranks <= k).astype(jnp.float32)
        for k in (20, 50, 100)
    }


def get_metric_score(
    pos_train_pred: jnp.ndarray,
    pos_val_pred: jnp.ndarray,
    neg_val_pred: jnp.ndarray,
    pos_test_pred: jnp.ndarray,
    neg_test_pred: jnp.ndarray,
    k_list: Sequence[int] = (100,),
    with_mrr: bool = False,
) -> Dict[str, tuple]:
    """Shared-negative evaluation (reference: evaluation.py:108-127).
    Returns {metric: (train, valid, test)}. Train positives are scored
    against the *validation* negatives, as in the reference (:114,122)."""
    result = {}
    neg_val_sorted = jnp.sort(neg_val_pred)
    neg_test_sorted = jnp.sort(neg_test_pred)
    for k in k_list:
        result[f"Hits@{k}"] = (
            float(evaluate_hits_single(
                pos_train_pred, neg_val_sorted, k, neg_sorted=True)),
            float(evaluate_hits_single(
                pos_val_pred, neg_val_sorted, k, neg_sorted=True)),
            float(evaluate_hits_single(
                pos_test_pred, neg_test_sorted, k, neg_sorted=True)),
        )
    if with_mrr:
        # shared negatives per positive (reference :122-124 broadcasts a
        # dense [P, K]; ranks against one shared set need only the
        # already-sorted negatives)
        def _mrr(pos, neg_sorted):
            return float(jnp.mean(1.0 / mrr_ranks_shared(pos, neg_sorted)))
        result["MRR"] = (
            _mrr(pos_train_pred, neg_val_sorted),
            _mrr(pos_val_pred, neg_val_sorted),
            _mrr(pos_test_pred, neg_test_sorted),
        )
    return result


def get_metric_score_citation2(
    pos_train_pred: jnp.ndarray,
    pos_val_pred: jnp.ndarray,
    neg_val_pred: jnp.ndarray,
    pos_test_pred: jnp.ndarray,
    neg_test_pred: jnp.ndarray,
) -> Dict[str, tuple]:
    """Per-positive-negatives MRR (reference: evaluation.py:130-148).
    neg_*_pred: [P, K]."""
    r_train = evaluate_mrr(pos_train_pred, neg_val_pred)
    r_val = evaluate_mrr(pos_val_pred, neg_val_pred)
    r_test = evaluate_mrr(pos_test_pred, neg_test_pred)
    return {"MRR": (r_train["MRR"], r_val["MRR"], r_test["MRR"])}


def evaluate_auc(
    val_pred: jnp.ndarray, val_true: jnp.ndarray
) -> Dict[str, float]:
    """ROC-AUC / AP without sklearn (reference: evaluation.py:93-104)."""
    import numpy as np

    pred = np.asarray(val_pred, dtype=np.float64)
    true = np.asarray(val_true, dtype=np.float64)
    order = np.argsort(-pred, kind="stable")
    true_sorted = true[order]
    p = true.sum()
    n_ = len(true) - p
    if p == 0 or n_ == 0:
        return {"AUC": 0.0, "AP": 0.0}
    # AUC via rank statistic (ties handled by average ranks)
    ranks = np.empty(len(pred))
    sorted_asc = np.argsort(pred, kind="stable")
    vals = pred[sorted_asc]
    avg = np.arange(1, len(pred) + 1, dtype=np.float64)
    # average ranks over ties
    _, inv, cnts = np.unique(vals, return_inverse=True, return_counts=True)
    cum = np.cumsum(cnts)
    start = cum - cnts
    avg_rank = (start + cum + 1) / 2.0
    ranks[sorted_asc] = avg_rank[inv]
    auc = (ranks[true == 1].sum() - p * (p + 1) / 2) / (p * n_)
    # AP
    tp = np.cumsum(true_sorted)
    precision = tp / np.arange(1, len(true_sorted) + 1)
    ap = (precision * true_sorted).sum() / p
    return {"AUC": round(float(auc), 4), "AP": round(float(ap), 4)}
