#!/usr/bin/env python
"""Audit context-set sizes to choose per-dataset caps and budgets.

The reference has no caps: its context sets are unbounded sparse sets
(reference: src/models/link_transformer.py:214-319). This framework pads
them to static per-class budgets; the right budgets are a property of
the DATASET (PPR eps, thresholds, degree distribution). This script
measures them:

  * adjacency-row and PPR-row length percentiles -> adj_cap / ppr_cap
  * per-link context counts by class (pre-truncation, exact) over a
    sampled link batch -> budget_cn / budget_onehop / budget_non1hop
  * overflow rate at the recommended budgets

Run on the real npz once exported (scripts/export_datasets.py):

    python scripts/audit_budgets.py --data_name ogbl-collab \
        --eps 5e-5 --platform cpu --sample 4096

The recommendation is p99.9 rounded up to a multiple of 8 (overflow
beyond that degrades gracefully: compaction keeps top-by-PPR).
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def pct_table(name, lengths):
    qs = [50, 90, 99, 99.9, 100]
    vals = [int(np.percentile(lengths, q)) for q in qs]
    print(f"  {name:<12} " + "  ".join(
        f"p{q}={v}" for q, v in zip(qs, vals)
    ))
    return vals


def rec(p999):
    return max(8, int(-(-p999 // 8) * 8))


def main():
    sys.path.insert(0, ".")
    from lpformer_tpu.cli.run import build_parser, load_dataset

    ap = build_parser()
    ap.add_argument("--sample", type=int, default=4096)
    args = ap.parse_args()
    if args.platform:
        import os

        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    from lpformer_tpu.ops.context import ContextConfig, extract_context

    ds = load_dataset(args)
    g = ds.graph
    print(f"dataset {ds.name}: N={ds.num_nodes} "
          f"adj_cap={g.adj_rows.cap} ppr_cap={g.ppr_rows.cap}")

    print("row lengths (cap candidates; rows at the current cap may be "
          "truncated — re-run with --adj-cap/--ppr-cap raised to verify):")
    adj_len = np.asarray(g.adj_rows.counts)
    ppr_len = np.asarray(g.ppr_rows.counts)
    a = pct_table("adjacency", adj_len)
    p = pct_table("ppr rows", ppr_len)
    at_cap = float((adj_len >= g.adj_rows.cap).mean())
    pp_cap = float((ppr_len >= g.ppr_rows.cap).mean())
    print(f"  rows at adj cap: {at_cap:.2%}   rows at ppr cap: {pp_cap:.2%}")

    cfg = ContextConfig.from_thresholds(
        args.thresh_cn, args.thresh_1hop, args.thresh_non1hop,
        budget_cn=g.adj_rows.cap,
        budget_onehop=2 * g.adj_rows.cap,
        budget_non1hop=g.ppr_rows.cap,
    )
    rng = np.random.default_rng(0)
    tp = np.asarray(ds.train_pos)
    idx = rng.permutation(len(tp))[: args.sample]
    src = jnp.asarray(tp[idx, 0])
    tgt = jnp.asarray(tp[idx, 1])
    ctx = jax.jit(
        lambda s, t: extract_context(g.adj_rows, g.ppr_rows, s, t, cfg)
    )(src, tgt)
    counts = np.asarray(ctx.counts)

    print(f"per-link context counts over {len(idx)} sampled train links "
          f"(mode={cfg.mask_mode}):")
    cn = pct_table("cn", counts[:, 0])
    oh = pct_table("1-hop", counts[:, 1])
    n1 = pct_table("non-1hop", counts[:, 2])

    b_cn, b_oh, b_n1 = rec(cn[3]), rec(oh[3]), rec(n1[3])
    over = (
        np.maximum(counts[:, 0] - b_cn, 0)
        + np.maximum(counts[:, 1] - b_oh, 0)
        + np.maximum(counts[:, 2] - b_n1, 0)
    )
    print("recommended flags (p99.9, multiple of 8):")
    print(f"  --budget-cn {b_cn} --budget-onehop {b_oh} "
          f"--budget-non1hop {b_n1}")
    print(f"  links with any overflow at these budgets: "
          f"{float((over > 0).mean()):.3%} "
          f"(mean dropped when overflowing: "
          f"{float(over[over > 0].mean()) if (over > 0).any() else 0:.1f}; "
          f"kept set is top-by-PPR)")


if __name__ == "__main__":
    main()
