#!/usr/bin/env python
"""Budget-overflow accuracy study on a heavy-tailed synthetic graph.

The reference's >1-hop context selection is unbounded
(reference: src/models/link_transformer.py:434-481); this framework
truncates to static per-class budgets with top-by-PPR retention
(ops/context.py:_compact). This study measures what that truncation
costs: train the same model at a sweep of budget scales on a synthetic
graph with an ogbl-ppa-like degree tail (power=1.2 preferential
attachment) and plot metric vs overflow rate — the evidence behind the
cap table in DATA_REQUEST.md (the rows marked "audit!").

Writes overflow_study.json:
  [{scale, budgets, link_overflow_rate, entry_overflow_rate,
    best_valid_mrr, test_mrr}]

Usage:  python scripts/overflow_study.py [--epochs 12] [--runs 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=4000)
    ap.add_argument("--edges", type=int, default=32000)
    ap.add_argument("--power", type=float, default=1.2)
    ap.add_argument("--eps", type=float, default=5e-4)
    ap.add_argument("--epochs", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--communities", type=int, default=80,
                    help="planted-partition communities (0 = the old "
                         "pure power-law graph). Intra-community "
                         "positives make link structure learnable, so "
                         "the base MRR is high enough to DETECT "
                         "truncation damage (VERDICT r3 weak #4)")
    ap.add_argument("--intra", type=float, default=0.85)
    ap.add_argument("--scales", type=str,
                    default="0.125,0.25,0.5,1.0,1.5,2.0")
    ap.add_argument("--out", type=str, default="overflow_study.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp  # noqa: F401

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig
    from lpformer_tpu.ops.context import extract_context
    from lpformer_tpu.train.trainer import (
        TrainArgs, overflow_audit, train_data,
    )

    # row caps at the audit recommendation (~p99.9 of row lengths): an
    # UNCAPPED heavy-tail graph stores [N, max_degree] row tables (the
    # power-1.2 hub has degree ~2700) and the compare-all extraction
    # goes quadratic on CPU. Budget truncation — the subject here — is
    # measured downstream of these caps, exactly as in production.
    ds = synthetic_dataset(
        seed=0, num_nodes=args.nodes, num_train=args.edges,
        num_eval=512, feat_dim=16, eps=args.eps, power=args.power,
        adj_cap=512, ppr_cap=512,
        communities=args.communities, intra_frac=args.intra,
    )
    deg = np.asarray(ds.graph.degree)
    print(f"[study] degree tail: p50={np.percentile(deg, 50):.0f} "
          f"p99={np.percentile(deg, 99):.0f} max={deg.max():.0f}")

    # exact per-class context sizes: ContextTables.counts is computed
    # PRE-truncation (ops/context.py), so a tiny-budget probe suffices —
    # node-count-sized budgets would make the compare-all extraction
    # enormous on CPU
    probe_cfg = LPFormerConfig(
        dim=32, gnn_layers=1, thresh_cn=0.0, thresh_1hop=1e-4,
        thresh_non1hop=1e-4,
        budget_cn=8, budget_onehop=8, budget_non1hop=8,
        dropout=0.0, gnn_drop=0.0, att_drop=0.0,
    )
    tp = np.asarray(ds.train_pos)
    idx = np.random.default_rng(0).choice(len(tp), 1024, replace=False)
    ctx = jax.jit(
        lambda a, p, s, t: extract_context(a, p, s, t, probe_cfg.context)
    )(ds.graph.adj_rows, ds.graph.ppr_rows,
      jnp.asarray(tp[idx, 0]), jnp.asarray(tp[idx, 1]))
    counts = np.asarray(ctx.counts)  # [B, 4] cn, 1hop, non1hop, neighbors

    def p99_8(v):
        return max(8, int(-(-np.percentile(v, 99) // 8) * 8))

    base = (p99_8(counts[:, 0]), p99_8(counts[:, 1]), p99_8(counts[:, 2]))
    print(f"[study] p99 class budgets (scale 1.0): {base}; "
          f"class maxima: {counts[:, :3].max(axis=0).astype(int)}")

    rows = []
    for scale in [float(s) for s in args.scales.split(",")]:
        budgets = tuple(max(8, int(-(-b * scale // 8) * 8)) for b in base)
        cfg = LPFormerConfig(
            dim=32, gnn_layers=1, thresh_cn=0.0, thresh_1hop=1e-4,
            thresh_non1hop=1e-4, budget_cn=budgets[0],
            budget_onehop=budgets[1], budget_non1hop=budgets[2],
            dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        )
        link_rate, entry_rate = overflow_audit(ds, cfg, sample=1024)
        targs = TrainArgs(
            epochs=args.epochs, lr=5e-3, batch_size=256,
            test_batch_size=1024, eval_steps=2, kill_cnt=100,
            runs=args.runs, metric="MRR", verbose=False,
            data_name=f"overflow-{scale}", audit_budgets=False,
        )
        best, valid_s, test_s = train_data(targs, cfg, ds)
        row = {
            "scale": scale,
            "budgets": list(budgets),
            "link_overflow_rate": round(link_rate, 4),
            "entry_overflow_rate": round(entry_rate, 4),
            "best_valid_mrr": round(float(best), 4),
            "valid_stat": valid_s,
            "test_stat": test_s,
        }
        rows.append(row)
        print(f"[study] scale={scale:<4} budgets={budgets} "
              f"link_ovf={link_rate:.1%} entry_ovf={entry_rate:.1%} "
              f"valid={valid_s} test={test_s}", flush=True)

    artifact = {
        "graph": {
            "nodes": args.nodes, "edges": args.edges,
            "power": args.power, "eps": args.eps,
            "communities": args.communities, "intra_frac": args.intra,
            "degree_p99": float(np.percentile(deg, 99)),
            "degree_max": float(deg.max()),
        },
        "base_budgets_p99": list(base),
        "epochs": args.epochs, "runs": args.runs,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[study] wrote {args.out}")


if __name__ == "__main__":
    main()
