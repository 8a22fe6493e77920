#!/usr/bin/env python
"""Measure the citation2-scale EVAL wall on the real TPU.

The reference's citation2 MRR sweep scores every positive against 1000
shared negatives in test batches (reference: src/train/testing.py:14-47);
at real-ogbl-citation2 scale that is ~8.6M valid + 8.6M test scored
links per eval. VERDICT r3 asked for a measured eval ms/batch at the
citation2-like preset and an end-to-end eval-epoch estimate — train
throughput was benched every round, eval never was.

Measures, on the citation2-like synthetic (1M nodes / 5M edges, dim 64):
  * propagate-once wall (the single full-graph GCN, reused per sweep)
  * score ms/batch for B=32768 links via the grouped-scan scorer
  * -> links/s and an end-to-end estimate for the REAL ogbl-citation2
    eval epoch (86k valid pos x (1 + 1000 negs) + same for test + 86k
    train_pos_val), per reference semantics.

Writes eval_wall.json. Usage: python scripts/eval_wall.py [--batch 32768]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--budget-combined", type=int, default=None,
                    help="score with the combined class-tagged context "
                         "table at this budget (None = classic blocks)")
    ap.add_argument("--groups", type=int, default=4,
                    help="EVAL_GROUP-batch launches to time")
    ap.add_argument("--out", type=str, default="eval_wall.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import PRESETS
    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.evalx import harness
    from lpformer_tpu.models import LPFormerConfig, init_lpformer

    p = PRESETS["citation2-like"]
    t0 = time.time()
    ds = synthetic_dataset(
        seed=0, num_nodes=p["nodes"], num_train=p["edges"], num_eval=1000,
        feat_dim=p["feat"], eps=5e-4, adj_cap=96, ppr_cap=256,
        ppr_cache_dir=".synth_cache",
    )
    print(f"[eval-wall] dataset built in {time.time()-t0:.1f}s",
          file=sys.stderr, flush=True)
    cfg = LPFormerConfig(
        dim=p["dim"], gnn_layers=p["gnn_layers"],
        budget_cn=p["budgets"][0], budget_onehop=p["budgets"][1],
        budget_non1hop=p["budgets"][2],
        budget_combined=args.budget_combined, matmul_dtype="bfloat16",
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=p["feat"])

    # --- propagate once (the full-graph GCN reused across the sweep) ---
    prop = harness._propagate_fn(cfg)
    t0 = time.time()
    X = prop(params, ds.graph)
    float(X[0, 0])  # true sync through the tunnel
    compile_prop = time.time() - t0
    t0 = time.perf_counter()
    X = prop(params, ds.graph)
    float(X[0, 0])
    prop_ms = (time.perf_counter() - t0) * 1e3
    print(f"[eval-wall] propagate-once {prop_ms:.1f} ms "
          f"(first call {compile_prop:.1f}s)", file=sys.stderr, flush=True)

    # --- grouped-scan scoring ---
    group = harness._score_group_fn(cfg)
    b = args.batch
    rng = np.random.default_rng(0)
    tgts = jnp.asarray(
        rng.integers(0, ds.num_nodes,
                     (harness.EVAL_GROUP, b)).astype(np.int32))

    compile_score = 0.0

    def time_structure(srcs):
        nonlocal compile_score
        t0 = time.time()
        out = group(params, ds.graph, X, srcs, tgts)
        float(out.sum())
        compile_score = max(compile_score, time.time() - t0)
        t0 = time.perf_counter()
        acc = out
        for _ in range(args.groups):
            salt = (acc[0, 0] > 1e30).astype(jnp.int32)
            acc = group(params, ds.graph, X, srcs + salt, tgts)
        float(acc.sum())
        group_ms = (time.perf_counter() - t0) / args.groups * 1e3
        return group_ms / harness.EVAL_GROUP

    # (a) i.i.d. random pairs — the conservative structure
    srcs_rand = jnp.asarray(
        rng.integers(0, ds.num_nodes,
                     (harness.EVAL_GROUP, b)).astype(np.int32))
    batch_ms = time_structure(srcs_rand)
    links_per_s = b / (batch_ms / 1e3)
    # (b) the REAL citation2 negative-sweep structure: each positive's
    # source is scored against 1000 negatives (reference
    # testing.py:50-74), so a B=32768 batch holds ~B/1000 distinct
    # sources, each repeated 1000x. Those repeats hit the gather
    # engine's cached window (STATUS r4 finding #2 cuts the other way
    # for reads), so the real sweep runs FASTER than random pairs —
    # measured, not assumed.
    k = 1000
    n_pos = max(b // k, 1)
    g = np.repeat(rng.integers(0, ds.num_nodes,
                               (harness.EVAL_GROUP, n_pos)), k, axis=1)[:, :b]
    if g.shape[1] < b:
        g = np.concatenate(
            [g, np.tile(g[:, -1:], (1, b - g.shape[1]))], axis=1)
    batch_ms_grouped = time_structure(jnp.asarray(g.astype(np.int32)))
    links_per_s_grouped = b / (batch_ms_grouped / 1e3)
    print(f"[eval-wall] score: {batch_ms:.2f} ms/batch random "
          f"({links_per_s:,.0f} links/s); {batch_ms_grouped:.2f} ms/batch "
          f"real negative-sweep structure ({n_pos} srcs x {k} negs, "
          f"{links_per_s_grouped:,.0f} links/s)", flush=True)

    # --- real-citation2 eval-epoch estimate (reference semantics) ---
    # valid: 86,596 pos x (1 + 1000 shared-per-pos negs); test: 86,596;
    # train_pos_val sized like valid (ogbl-citation2 split sizes)
    n_eval_pos = 86_596
    pos_links = 3 * n_eval_pos              # scored as random-ish pairs
    neg_links = 2 * n_eval_pos * 1000       # the grouped negative sweep
    scored_links = pos_links + neg_links
    eval_s = (pos_links / links_per_s
              + neg_links / links_per_s_grouped + 2 * prop_ms / 1e3)
    print(f"[eval-wall] real-citation2 eval epoch estimate: "
          f"{scored_links/1e6:.1f}M scored links -> {eval_s:.1f}s",
          flush=True)

    artifact = {
        "preset": "citation2-like",
        "budget_combined": args.budget_combined,
        "batch": b,
        "eval_group": harness.EVAL_GROUP,
        "propagate_ms": round(prop_ms, 2),
        "score_ms_per_batch": round(batch_ms, 3),
        "score_links_per_s": round(links_per_s, 1),
        "score_ms_per_batch_negative_sweep": round(batch_ms_grouped, 3),
        "score_links_per_s_negative_sweep": round(links_per_s_grouped, 1),
        "real_citation2_scored_links": scored_links,
        "real_citation2_eval_epoch_s": round(eval_s, 2),
        "compile_s": {"propagate": round(compile_prop, 1),
                      "score": round(compile_score, 1)},
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"metric": "eval_links_per_s", "value":
                      round(links_per_s_grouped, 1), "unit": "links/s"}))


if __name__ == "__main__":
    main()
