"""Standalone context-extraction benchmark at the collab-like bench
shape, in its full TRAINING form (per-batch positive-edge masking +
attention dropout) — the configuration the step budget's "context
extraction" category measures (step_budget.json).

Decomposition probes (each chained on a scalar carry so nothing is
DCE'd or overlapped, same pattern as scripts/stage_profile3.py):

  extract_train   full masked extraction (bitmap + extraction)
  extract_eval    unmasked extraction (the eval path)
  bitmap_only     batch_mask_ranks alone (rank recovery + scatter)

Usage: python scripts/extraction_bench.py [--smoke]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _benchutil import time_chained_ms as _time_chained  # noqa: E402


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.numpy as jnp

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig
    from lpformer_tpu.ops import masking
    from lpformer_tpu.ops.context import extract_context

    nodes = 5_000 if smoke else 50_000
    edges = 40_000 if smoke else 400_000
    b = 512 if smoke else 4096
    ds = synthetic_dataset(
        seed=0, num_nodes=nodes, num_train=edges, num_eval=1000,
        feat_dim=128, eps=5e-4, adj_cap=96, ppr_cap=256,
        ppr_cache_dir=".synth_cache",
    )
    cfg = LPFormerConfig(
        dim=128, gnn_layers=3, budget_cn=64, budget_onehop=128,
        budget_non1hop=128, att_drop=0.1,
    )
    graph = ds.graph
    tp = np.asarray(ds.train_pos)
    tp2 = np.tile(tp, (-(-b // len(tp)), 1))[:b]
    src = jnp.asarray(tp2[:, 0].astype(np.int32))
    tgt = jnp.asarray(tp2[:, 1].astype(np.int32))
    mult = ds.mask_mult_device
    rng = jax.random.PRNGKey(0)

    def bitmap_only(c, s_, t_):
        s_ = s_ + jnp.minimum(c.astype(jnp.int32), 0)  # chain the carry
        bm = masking.batch_mask_ranks(graph.adj_rows, s_, t_, mult)
        return jnp.tanh(jnp.sum(bm.astype(jnp.float32)) * 1e-9)

    def extract_train(c, s_, t_):
        s_ = s_ + jnp.minimum(c.astype(jnp.int32), 0)
        bm = masking.batch_mask_ranks(graph.adj_rows, s_, t_, mult)
        ctx = extract_context(
            graph.adj_rows, graph.ppr_rows, s_, t_, cfg.context,
            mask_ranks=bm, drop_rng=rng, train=True,
        )
        return jnp.tanh(
            (jnp.sum(ctx.counts) + jnp.sum(ctx.src_ppr)
             + jnp.sum(ctx.ids.astype(jnp.float32))) * 1e-12
        )

    def extract_eval(c, s_, t_):
        s_ = s_ + jnp.minimum(c.astype(jnp.int32), 0)
        ctx = extract_context(
            graph.adj_rows, graph.ppr_rows, s_, t_, cfg.context,
        )
        return jnp.tanh(
            (jnp.sum(ctx.counts) + jnp.sum(ctx.src_ppr)
             + jnp.sum(ctx.ids.astype(jnp.float32))) * 1e-12
        )

    results = {}
    for name, fn in (
        ("bitmap_only", bitmap_only),
        ("extract_train", extract_train),
        ("extract_eval", extract_eval),
    ):
        ms, comp = _time_chained(jax, jnp, fn, (src, tgt))
        results[name] = {"ms": round(ms, 3), "compile_s": round(comp, 1)}
        print(name, results[name])

    print(json.dumps({
        "batch": b, "nodes": nodes,
        "shape": "adj_cap=96 ppr_cap=256 budgets 64/128/128",
        "results": results,
    }))


if __name__ == "__main__":
    main()
