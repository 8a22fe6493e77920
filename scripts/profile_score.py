#!/usr/bin/env python
"""Op-level TPU budget of the citation2 EVAL scoring launch.

VERDICT r4 weak #4 / next-round #4: the citation2 eval wall is
scoring-dominated (173.5M links per eval epoch, reference flow
src/train/testing.py:50-74). eval_wall.json gives the wall; this script
explains it: it traces the exact grouped-scan scorer launch
(`harness._score_group_fn`, EVAL_GROUP batches per executable) on the
citation2-like preset, attributes device time to subsystem categories,
and emits score_budget.json with a ceiling note per category.

It also times BOTH batch structures:
  * random  — i.i.d. (src, tgt) pairs (what eval_wall.json measured)
  * grouped — the REAL citation2 shape: B/1000 distinct sources each
    repeated 1000x (reference scores each positive against 1000 shared
    negatives). Same-row gathers can serialize on the TPU gather engine
    (STATUS r4 finding #2), so the real eval may run at a different
    rate than the random benchmark — this measures instead of assuming.

Usage:
  python scripts/profile_score.py [--batch 32768] [--groups 2]
                                  [--out score_budget.json]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from step_budget import shape_bytes  # noqa: E402


def categorize(base: str, shape: str, tf_op: str) -> str:
    """Score-path categories, keyed on source-path (tf_op) first."""
    if "fused_pe_link_attention" in base or "fused_pe_link_attention" in tf_op:
        return "attention kernel (Pallas fwd)"
    if "gather_rows" in tf_op:
        return "context key gather (X rows)"
    if "gather_link_rows" in tf_op or "link_rows" in tf_op:
        return "endpoint row gather (adj+ppr)"
    if ("extract_context" in tf_op or "row_contains" in tf_op
            or "row_lookup" in tf_op or "compact" in tf_op):
        return "context extraction (membership+compaction)"
    if base == "sort":
        return "context extraction (membership+compaction)"
    if re.match(r"(bf16|f32)\[3\d{6},", shape):
        # [GROUP*B*C, dim] combined-table key gather rows
        return "context key gather (X rows)"
    if re.search(r"pred\[32768,", shape) or re.search(r"\[32768,\d+,", shape):
        return "context extraction (membership+compaction)"
    return "other (MLPs, scoring head, layout)"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--groups", type=int, default=2,
                    help="group launches to trace")
    ap.add_argument("--neg-per-pos", type=int, default=1000)
    ap.add_argument("--trace-dir", type=str, default="/tmp/score_trace")
    ap.add_argument("--out", type=str, default="score_budget.json")
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
    print(f"[score] dataset in {time.time()-t0:.1f}s", file=sys.stderr,
          flush=True)
    cfg = LPFormerConfig(
        dim=p["dim"], gnn_layers=p["gnn_layers"],
        budget_cn=p["budgets"][0], budget_onehop=p["budgets"][1],
        budget_non1hop=p["budgets"][2],
        budget_combined=p.get("combined"), matmul_dtype="bfloat16",
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=p["feat"])
    prop = harness._propagate_fn(cfg)
    X = prop(params, ds.graph)
    float(X[0, 0])
    group = harness._score_group_fn(cfg)
    b, G = args.batch, harness.EVAL_GROUP
    rng = np.random.default_rng(0)

    def time_structure(srcs, tgts, n_iter=4):
        out = group(params, ds.graph, X, srcs, tgts)
        float(out.sum())          # compile+warm; true sync
        acc = out
        t0 = time.perf_counter()
        for _ in range(n_iter):
            salt = (acc[0, 0] > 1e30).astype(jnp.int32)
            acc = group(params, ds.graph, X, srcs + salt, tgts)
        float(acc.sum())
        ms = (time.perf_counter() - t0) / n_iter / G * 1e3
        return ms, acc

    # random pairs (eval_wall.json's structure)
    r_src = jnp.asarray(rng.integers(0, ds.num_nodes, (G, b), dtype=np.int32))
    r_tgt = jnp.asarray(rng.integers(0, ds.num_nodes, (G, b), dtype=np.int32))
    ms_rand, _ = time_structure(r_src, r_tgt)

    # real citation2 structure: B/K distinct srcs, each repeated K times
    k = args.neg_per_pos
    n_pos = max(b // k, 1)
    g_src = np.repeat(
        rng.integers(0, ds.num_nodes, (G, n_pos), dtype=np.int32),
        k, axis=1)[:, :b]
    if g_src.shape[1] < b:          # pad tail with the last positive
        g_src = np.concatenate(
            [g_src, np.tile(g_src[:, -1:], (1, b - g_src.shape[1]))], axis=1)
    ms_grp, _ = time_structure(jnp.asarray(g_src), r_tgt)
    print(f"[score] {ms_rand:.2f} ms/batch random pairs, {ms_grp:.2f} "
          f"ms/batch grouped ({n_pos} srcs x {k} negs)", flush=True)

    # --- trace the grouped (real-shape) launch ---
    srcs, tgts = jnp.asarray(g_src), r_tgt
    with jax.profiler.trace(args.trace_dir):
        acc = group(params, ds.graph, X, srcs, tgts)
        for _ in range(args.groups - 1):
            salt = (acc[0, 0] > 1e30).astype(jnp.int32)
            acc = group(params, ds.graph, X, srcs + salt, tgts)
        float(acc.sum())

    traces = sorted(glob.glob(args.trace_dir + "/**/*.trace.json.gz",
                              recursive=True))
    d = json.loads(gzip.open(traces[-1]).read())
    ev = d["traceEvents"]
    dev_pids = {
        e["pid"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    tid_names = {
        (e["pid"], e["tid"]): e["args"]["name"] for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e["pid"] in dev_pids
    }
    ops = [e for e in ev if e.get("ph") == "X"
           and tid_names.get((e.get("pid"), e.get("tid"))) == "XLA Ops"]
    n_batches = args.groups * G
    cat = collections.defaultdict(lambda: [0.0, 0, 0])
    groups_agg = collections.defaultdict(lambda: [0.0, 0])
    for e in ops:
        ln = str(e.get("args", {}).get("long_name") or "")
        m = re.match(r"%\S+ = \(?([a-z0-9]+\[[0-9,]*\])", ln)
        shape = m.group(1) if m else "?"
        base = re.sub(r"\.\d+$", "", e["name"])
        c = categorize(base, shape,
                       str(e.get("args", {}).get("tf_op") or ""))
        cat[c][0] += e["dur"]
        cat[c][1] += 1
        cat[c][2] += shape_bytes(shape)
        groups_agg[(base, shape, c)][0] += e["dur"]
        groups_agg[(base, shape, c)][1] += 1

    total_ms = sum(v[0] for v in cat.values()) / n_batches / 1e3
    rows = []
    for c, (us, cnt, byt) in sorted(cat.items(), key=lambda kv: -kv[1][0]):
        ms = us / n_batches / 1e3
        gb = byt / n_batches / 1e9
        rows.append({
            "category": c, "ms_per_batch": round(ms, 3),
            "pct": round(100 * ms / total_ms, 1),
            "output_gb_per_batch": round(gb, 3),
            "eff_gbps_outputs": round(gb / (ms / 1e3), 1) if ms else 0,
        })
        print(f"{ms:8.2f} ms {100*ms/total_ms:5.1f}%  out={gb:6.2f} GB "
              f"({gb/(ms/1e3) if ms else 0:6.0f} GB/s)  {c}")
    top = sorted(groups_agg.items(), key=lambda kv: -kv[1][0])[:25]
    top_rows = [
        {"op": bname, "shape": s, "category": c,
         "ms_per_batch": round(us / n_batches / 1e3, 3),
         "calls_per_batch": cnt // n_batches}
        for (bname, s, c), (us, cnt) in top
    ]
    artifact = {
        "preset": "citation2-like",
        "batch": b,
        "eval_group": G,
        "budget_combined": p.get("combined"),
        "score_ms_per_batch_random": round(ms_rand, 3),
        "score_ms_per_batch_grouped": round(ms_grp, 3),
        "grouped_structure": f"{n_pos} srcs x {k} negs per batch",
        "links_per_s_random": round(b / ms_rand * 1e3, 1),
        "links_per_s_grouped": round(b / ms_grp * 1e3, 1),
        "leaf_attributed_ms": round(total_ms, 2),
        "categories": rows,
        "top_ops": top_rows,
        "trace": traces[-1],
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"[score] wrote {args.out}")


if __name__ == "__main__":
    main()
