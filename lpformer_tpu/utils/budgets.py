"""Automatic context-budget selection.

The reference's context sets are unbounded dynamic sparse sets
(reference: src/models/link_transformer.py:214-319, 434-481); this
framework pads them to static per-class budgets. The right budgets are
a property of the dataset (PPR eps, thresholds, degree distribution),
so when the user does not pass ``--budget-*`` we MEASURE them instead
of guessing from row caps: sample train links, extract exact
pre-truncation class counts (``ContextTables.counts`` is exact
regardless of the measurement budgets, ops/context.py), and take
p99.9 rounded up to a multiple of 8 — the same recommendation logic as
``scripts/audit_budgets.py``, now applied by default so a real-data run
can't silently truncate just because nobody ran the audit script.

The measurement runs on the host CPU backend (cheap, never pays a
tunnel compile). If no CPU backend exists, returns None and the caller
falls back to the row-cap heuristics.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _rec(p999: float, lo: int, hi: int, align: int = 32) -> int:
    """p99.9 rounded up to a multiple of ``align``, clamped to
    [lo, hi] (hi = what the padded rows can physically supply).
    align=32 (not the audit script's 8): the fused Pallas PE+attention
    kernel needs gcd(budgets) >= 32 to tile the context axis
    (ops/pallas/pe_attention.py:pe_attention_tile) — a few padded rows
    per class is far cheaper than falling back to the XLA path."""
    b = max(align, int(-(-int(p999) // align) * align))
    return int(min(max(b, lo), hi))


def derive_budgets(
    ds,
    thresh_cn: float,
    thresh_1hop: float,
    thresh_non1hop: float,
    sample: int = 2048,
    seed: int = 0,
    include_combined: bool = False,
) -> Optional[Tuple[int, ...]]:
    """Measured (budget_cn, budget_onehop, budget_non1hop) for this
    dataset at these thresholds, or None when no CPU backend exists.
    With ``include_combined`` a 4th element is appended: the p99.9 of
    the TOTAL per-link count — the combined (class-tagged) table budget
    (ContextConfig.budget_combined). Class tails do not stack, so this
    is typically far below the summed per-class budgets."""
    import jax
    import jax.numpy as jnp

    from lpformer_tpu.ops.context import ContextConfig, extract_context

    try:
        cpu0 = jax.devices("cpu")[0]
    except RuntimeError:
        return None

    g = ds.graph
    adj_cap, ppr_cap = g.adj_rows.cap, g.ppr_rows.cap
    cfg = ContextConfig.from_thresholds(
        thresh_cn, thresh_1hop, thresh_non1hop,
        # measurement budgets are irrelevant to .counts (exact
        # pre-truncation); keep them small so the probe is cheap
        budget_cn=min(32, adj_cap),
        budget_onehop=min(32, 2 * adj_cap),
        budget_non1hop=min(32, ppr_cap),
    )
    tp = np.asarray(ds.train_pos)
    take = min(sample, len(tp))
    idx = np.random.default_rng(seed).choice(len(tp), take, replace=False)
    with jax.default_device(cpu0):
        ctx = jax.jit(
            lambda a, p, s, t: extract_context(a, p, s, t, cfg)
        )(
            jax.device_put(g.adj_rows, cpu0),
            jax.device_put(g.ppr_rows, cpu0),
            jax.device_put(jnp.asarray(tp[idx, 0], jnp.int32), cpu0),
            jax.device_put(jnp.asarray(tp[idx, 1], jnp.int32), cpu0),
        )
    counts = np.asarray(ctx.counts)
    q = lambda col: float(np.percentile(col, 99.9))  # noqa: E731
    # class-count ceilings set by what the padded rows can supply:
    # CNs come from one adjacency row (<= adj_cap); 1-hop from both
    # endpoints' rows (<= 2*adj_cap); non-1hop from the PPR support
    # intersection (<= ppr_cap)
    b_cn = _rec(q(counts[:, 0]), 32, adj_cap)
    b_oh = _rec(q(counts[:, 1]), 32, 2 * adj_cap)
    b_n1 = _rec(q(counts[:, 2]), 32, ppr_cap)
    if not include_combined:
        return b_cn, b_oh, b_n1
    total = counts[:, 0] + counts[:, 1] + counts[:, 2]
    b_all = _rec(q(total), 32, 2 * adj_cap + ppr_cap)
    return b_cn, b_oh, b_n1, b_all
