"""DCE-proof step decomposition (third pass).

stage_profile.py's loss probes fed only ONE grad leaf into the timing
carry, so XLA dead-code-eliminated most of the backward (the node-grad
scatter, the GCN backward, every other weight-grad matmul) — the probes
under-measured and the step looked "153 ms slower than its parts".
Every probe here folds the FULL grad pytree into the carry, so nothing
can be eliminated and the stages must sum to ~the step.

Probes (collab-like bench shape, B=4096, shared propagation):
  loss_full      value_and_grad(loss_fn) pos+neg, full grads
  loss_opt       + clip/Adam/apply (the whole step body minus randint
                 and rank masking)
  pos_half       value_and_grad of the positive half only (mask_ranks)
  neg_half       value_and_grad of the negative half only (no masks)
  prop_full      value_and_grad of sum(propagate**2), full grads
  pairX_full     pos-half pairwise given X_node (stops grads at X? no —
                 includes dX and the scatter, full param grads)

Usage: python scripts/stage_profile3.py [--smoke] [--no-ell] [--bf16]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _gsum(tree):
    import jax
    import jax.numpy as jnp

    return sum(jnp.sum(x) for x in jax.tree_util.tree_leaves(tree))


def _time_chained(jax, jnp, fn, ops, n_warmup=2, n_iter=8):
    jfn = jax.jit(fn)
    c = jnp.zeros((), jnp.float32)
    t0 = time.time()
    for _ in range(n_warmup):
        c = jfn(c, *ops)
    float(c)
    compile_s = time.time() - t0
    c = jnp.zeros((), jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        c = jfn(c, *ops)
    float(c)
    return (time.perf_counter() - t0) / n_iter, compile_s


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.models import link_transformer as lt
    from lpformer_tpu.ops import masking
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import loss_fn

    nodes, edges, feat, dim, batch = 50_000, 400_000, 128, 128, 4096
    budgets, gnn_layers = (64, 128, 128), 3
    if smoke:
        nodes, edges, feat, dim, batch = 500, 2500, 32, 32, 256
        budgets, gnn_layers = (16, 32, 32), 1

    print(f"[stage3] device={jax.devices()[0]}", file=sys.stderr)
    ds = synthetic_dataset(
        seed=0, num_nodes=nodes, num_train=edges, num_eval=1000,
        feat_dim=feat, eps=5e-4, adj_cap=96, ppr_cap=256,
    )
    if "--no-ell" in sys.argv and ds.graph.ell is not None:
        import dataclasses

        ds.graph = dataclasses.replace(ds.graph, ell=None)
    cfg = LPFormerConfig(
        dim=dim, gnn_layers=gnn_layers, budget_cn=budgets[0],
        budget_onehop=budgets[1], budget_non1hop=budgets[2],
        matmul_dtype="bfloat16" if "--bf16" in sys.argv else "float32",
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=feat)
    graph = ds.graph

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
    mult = ds.mask_mult_device

    def dep(params, c):
        return jax.tree_util.tree_map(
            lambda p: p + jnp.tanh(c) * 1e-30, params
        )

    results = {}

    def report(name, dt, compile_s):
        results[name] = dt
        print(json.dumps({
            "metric": f"stage3_{name}_ms", "value": round(dt * 1e3, 2),
            "unit": "ms", "compile_s": round(compile_s, 1),
        }), flush=True)

    # -- loss fwd+bwd, FULL grads (shared propagation, masked pos) ----
    def loss_full(c, params, graph, mult, src, tgt, nsrc, ntgt, w, rng):
        mr = masking.batch_mask_ranks(graph.adj_rows, src, tgt, mult,
                                      weight=w)

        def f(p):
            return loss_fn(p, cfg, graph, src, tgt, nsrc, ntgt, w,
                           mr, None, rng, double_propagate=False)
        l, g = jax.value_and_grad(f)(dep(params, c))
        return jnp.tanh(l * 1e-3 + _gsum(g) * 1e-9)

    report("loss_full", *_time_chained(
        jax, jnp, loss_full,
        (params, graph, mult, src, tgt, neg_src, neg_tgt, w, rng0)))

    # -- + optimizer (≈ the whole bench step minus randint) -----------
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    opt_state0 = opt.init(params)

    def loss_opt(c, params, opt_state, graph, mult, src, tgt, nsrc, ntgt,
                 w, rng):
        import optax

        mr = masking.batch_mask_ranks(graph.adj_rows, src, tgt, mult,
                                      weight=w)

        def f(p):
            return loss_fn(p, cfg, graph, src, tgt, nsrc, ntgt, w,
                           mr, None, rng, double_propagate=False)
        l, g = jax.value_and_grad(f)(dep(params, c))
        updates, _ = opt.update(g, opt_state, params)
        p2 = optax.apply_updates(params, updates)
        return jnp.tanh(l * 1e-3 + _gsum(p2) * 1e-9)

    report("loss_opt", *_time_chained(
        jax, jnp, loss_opt,
        (params, opt_state0, graph, mult, src, tgt, neg_src, neg_tgt, w,
         rng0)))

    # -- halves: masked positive vs unmasked negative -----------------
    def pos_half(c, params, graph, mult, src, tgt, w, rng):
        mr = masking.batch_mask_ranks(graph.adj_rows, src, tgt, mult,
                                      weight=w)

        def f(p):
            h = lt.forward(p, cfg, graph, src, tgt, rng=rng, train=True,
                           mask_ranks=mr)
            s = lt.score_links(p, cfg, h, rng=rng, train=True)
            return -jnp.mean(jnp.log(s + 1e-6))
        l, g = jax.value_and_grad(f)(dep(params, c))
        return jnp.tanh(l * 1e-3 + _gsum(g) * 1e-9)

    report("pos_half", *_time_chained(
        jax, jnp, pos_half, (params, graph, mult, src, tgt, w, rng0)))

    def neg_half(c, params, graph, nsrc, ntgt, rng):
        def f(p):
            h = lt.forward(p, cfg, graph, nsrc, ntgt, rng=rng, train=True)
            s = lt.score_links(p, cfg, h, rng=rng, train=True)
            return -jnp.mean(jnp.log(1.0 - s + 1e-6))
        l, g = jax.value_and_grad(f)(dep(params, c))
        return jnp.tanh(l * 1e-3 + _gsum(g) * 1e-9)

    report("neg_half", *_time_chained(
        jax, jnp, neg_half, (params, graph, neg_src, neg_tgt, rng0)))

    # -- propagation fwd+bwd, full grads ------------------------------
    def prop_full(c, params, graph, rng):
        def f(p):
            X = lt.propagate(p, cfg, graph, rng=rng, train=True)
            return jnp.sum(X ** 2) * 1e-9
        l, g = jax.value_and_grad(f)(dep(params, c))
        return jnp.tanh(l + _gsum(g) * 1e-9)

    report("prop_full", *_time_chained(
        jax, jnp, prop_full, (params, graph, rng0)))

    derived = {
        "sum_halves_vs_loss_full": round(
            (results["pos_half"] + results["neg_half"]
             - results["loss_full"]) * 1e3, 1),
        "opt_overhead_ms": round(
            (results["loss_opt"] - results["loss_full"]) * 1e3, 1),
        "mask_extraction_extra_ms": round(
            (results["pos_half"] - results["neg_half"]) * 1e3, 1),
    }
    print(json.dumps({"derived_ms": derived}))


if __name__ == "__main__":
    main()
