"""Follow-up decomposition: stage_profile.py found the full step (268 ms)
costs 154 ms more than loss fwd+bwd (114 ms). Isolate which step
ingredient pays: the rank-bitmap masking, the rank-masked extraction
inside the loss, or the optimizer update.

  mask_only      batch_mask_ranks alone
  loss_fb_mask   mask computed in-program + loss_fn(mask_ranks=...)
  opt_only       clip + Adam + apply_updates on ones-like grads
  step_nomask    full step body (randint negs + loss + optimizer) with
                 mask_ranks=None
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.stage_profile import _time_chained  # noqa: E402


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig
    from lpformer_tpu.models import init_lpformer
    from lpformer_tpu.ops import masking
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import loss_fn

    nodes, edges, feat, dim, batch = 50_000, 400_000, 128, 128, 4096
    budgets, gnn_layers = (64, 128, 128), 3
    if smoke:
        nodes, edges, feat, dim, batch = 500, 2500, 32, 32, 256
        budgets, gnn_layers = (16, 32, 32), 1

    print(f"[stage2] device={jax.devices()[0]}", file=sys.stderr)
    ds = synthetic_dataset(
        seed=0, num_nodes=nodes, num_train=edges, num_eval=1000,
        feat_dim=feat, eps=5e-4, adj_cap=96, ppr_cap=256,
    )
    cfg = LPFormerConfig(
        dim=dim, gnn_layers=gnn_layers, budget_cn=budgets[0],
        budget_onehop=budgets[1], budget_non1hop=budgets[2],
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=feat)
    graph = ds.graph
    mult = ds.mask_mult_device

    tp = np.asarray(ds.train_pos)
    reps = -(-batch // len(tp))
    tp2 = np.tile(tp, (reps, 1))[:batch]
    src = jnp.asarray(tp2[:, 0])
    tgt = jnp.asarray(tp2[:, 1])
    rng0 = jax.random.PRNGKey(7)
    nrng = np.random.default_rng(3)
    neg_src = jnp.asarray(nrng.integers(0, nodes, batch, dtype=np.int32))
    neg_tgt = jnp.asarray(nrng.integers(0, nodes, batch, dtype=np.int32))
    w = jnp.ones((batch,), jnp.float32)

    def dep(t, c):
        return jax.tree_util.tree_map(lambda p: p + jnp.tanh(c) * 1e-30, t)

    def report(name, dt, compile_s):
        print(json.dumps({
            "metric": f"stage_{name}_ms", "value": round(dt * 1e3, 2),
            "unit": "ms", "compile_s": round(compile_s, 1),
        }), flush=True)

    # -- masking alone -------------------------------------------------
    def mask_only(c, graph, mult, src, tgt, w):
        cdep = jnp.minimum(c.astype(jnp.int32), 0)
        mr = masking.batch_mask_ranks(graph.adj_rows, src + cdep, tgt,
                                      mult, weight=w)
        return jnp.tanh(jnp.sum(mr.astype(jnp.float32)) * 1e-9)

    report("mask_only", *_time_chained(jax, jnp, mask_only,
                                       (graph, mult, src, tgt, w)))

    # -- loss fwd+bwd WITH the rank mask -------------------------------
    def lfm(c, params, graph, mult, src, tgt, nsrc, ntgt, w, rng):
        mr = masking.batch_mask_ranks(graph.adj_rows, src, tgt, mult,
                                      weight=w)

        def f(p):
            return loss_fn(p, cfg, graph, src, tgt, nsrc, ntgt, w,
                           mr, None, rng, double_propagate=True)
        l, g = jax.value_and_grad(f)(dep(params, c))
        gs = jax.tree_util.tree_leaves(g)[0]
        return jnp.tanh(l * 1e-3 + jnp.sum(gs) * 1e-9)

    report("loss_fb_mask", *_time_chained(
        jax, jnp, lfm,
        (params, graph, mult, src, tgt, neg_src, neg_tgt, w, rng0)))

    # -- optimizer alone -----------------------------------------------
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    opt_state0 = opt.init(params)

    def opt_only(c, params, opt_state):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.ones_like(p) * (1e-6 + jnp.tanh(c) * 1e-30),
            params)
        updates, opt_state = opt.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        gs = jax.tree_util.tree_leaves(p2)[0]
        return jnp.tanh(jnp.sum(gs) * 1e-9)

    report("opt_only", *_time_chained(jax, jnp, opt_only,
                                      (params, opt_state0)))

    # -- full step body, mask_ranks=None -------------------------------
    def step_nomask(c, params, opt_state, graph, src, tgt, w, rng):
        rng_neg, rng_loss = jax.random.split(rng)
        neg = jax.random.randint(rng_neg, (2, src.shape[0]), 0,
                                 graph.num_nodes, dtype=src.dtype)

        def f(p):
            return loss_fn(p, cfg, graph, src, tgt, neg[0], neg[1], w,
                           None, None, rng_loss, double_propagate=True)
        loss, grads = jax.value_and_grad(f)(dep(params, c))
        updates, opt_state = opt.update(grads, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        gs = jax.tree_util.tree_leaves(p2)[0]
        return jnp.tanh(loss * 1e-3 + jnp.sum(gs) * 1e-9)

    report("step_nomask", *_time_chained(
        jax, jnp, step_nomask,
        (params, opt_state0, graph, src, tgt, w, rng0)))


if __name__ == "__main__":
    main()
