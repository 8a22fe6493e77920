"""Stage-by-stage decomposition of the fused training step on TPU.

The full collab-like step measures ~265 ms, but the per-kernel
micro-benchmarks (bench.py --kernels) only account for ~100 ms. This
script times nested sub-programs of the real step as separate jitted
programs and prints one JSON line per stage so the dominant cost is
measured, not modeled:

  prop_fwd     propagate (3-layer GCN + LN) forward
  prop_fb      propagate forward+backward
  fwdX_fb      forward+score given X_node (context extraction + pe +
               attention + score), fwd+bwd     [pairwise block cost]
  fwd_fb       full single forward (propagate inside), fwd+bwd
  loss_fb      loss_fn pos+neg, double_propagate=True  (reference
               semantics, two full propagations)
  loss_fb_dp0  loss_fn with ONE shared propagation (fast path)
  step / step_dp0   the full optimizer step for both variants

Each program is timed with the chained-carry pattern (operands as jit
arguments; a host fetch is the only sync — jax.block_until_ready does
not block through the axon tunnel).
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from _benchutil import time_chained  # noqa: E402


def _time_chained(jax, jnp, fn, ops, n_warmup=2, n_iter=8, donate=False):
    return time_chained(jax, jnp, fn, ops, n_warmup, n_iter, donate)


def main():
    smoke = "--smoke" in sys.argv
    if smoke:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if smoke:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lpformer_tpu.data.synthetic import synthetic_dataset
    from lpformer_tpu.models import LPFormerConfig, init_lpformer
    from lpformer_tpu.models import link_transformer as lt
    from lpformer_tpu.ops.context import extract_context
    from lpformer_tpu.train import make_optimizer, make_train_step
    from lpformer_tpu.train.step import TrainState, loss_fn

    nodes, edges, feat, dim, batch = 50_000, 400_000, 128, 128, 4096
    budgets, gnn_layers = (64, 128, 128), 3
    if smoke:
        nodes, edges, feat, dim, batch = 500, 2500, 32, 32, 256
        budgets, gnn_layers = (16, 32, 32), 1

    print(f"[stage] device={jax.devices()[0]}", file=sys.stderr)
    t0 = time.time()
    ds = synthetic_dataset(
        seed=0, num_nodes=nodes, num_train=edges, num_eval=1000,
        feat_dim=feat, eps=5e-4, adj_cap=96, ppr_cap=256,
    )
    print(f"[stage] dataset built in {time.time()-t0:.1f}s", file=sys.stderr)

    cfg = LPFormerConfig(
        dim=dim, gnn_layers=gnn_layers, budget_cn=budgets[0],
        budget_onehop=budgets[1], budget_non1hop=budgets[2],
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

    def dep(params, c):
        # non-DCE-able, value-neutral dependency on the timing carry
        return jax.tree_util.tree_map(lambda p: p + jnp.tanh(c) * 1e-30,
                                      params)

    results = {}

    def report(name, dt, compile_s):
        results[name] = dt
        print(json.dumps({
            "metric": f"stage_{name}_ms", "value": round(dt * 1e3, 2),
            "unit": "ms", "compile_s": round(compile_s, 1),
        }), flush=True)

    # -- propagate fwd ------------------------------------------------
    def prop_fwd(c, params, graph, rng):
        X = lt.propagate(dep(params, c), cfg, graph, rng=rng, train=True)
        return jnp.tanh(jnp.sum(X) * 1e-9)

    report("prop_fwd", *_time_chained(jax, jnp, prop_fwd,
                                      (params, graph, rng0)))

    # -- propagate fwd+bwd --------------------------------------------
    def prop_fb(c, params, graph, rng):
        def f(p):
            X = lt.propagate(p, cfg, graph, rng=rng, train=True)
            return jnp.sum(X ** 2) * 1e-9
        l, g = jax.value_and_grad(f)(dep(params, c))
        gs = jax.tree_util.tree_leaves(g)[0]
        return jnp.tanh(l + jnp.sum(gs) * 1e-9)

    report("prop_fb", *_time_chained(jax, jnp, prop_fb,
                                     (params, graph, rng0)))

    # -- context extraction fwd (no grads flow into int tables) -------
    def ctx_fwd(c, graph, src, tgt):
        cdep = jnp.minimum(c.astype(jnp.int32), 0)
        ctx = extract_context(graph.adj_rows, graph.ppr_rows,
                              src + cdep, tgt, cfg.context)
        return jnp.tanh(
            (jnp.sum(ctx.counts) + jnp.sum(ctx.src_ppr[0])) * 1e-9)

    report("ctx_fwd", *_time_chained(jax, jnp, ctx_fwd, (graph, src, tgt)))

    # -- pairwise block given X_node: extract+pe+attention+score ------
    X0 = jax.block_until_ready(
        lt.propagate(params, cfg, graph, rng=None, train=False))

    def fwdX_fb(c, params, X0, graph, src, tgt, rng):
        def f(p, X):
            h = lt.forward(p, cfg, graph, src, tgt, rng=rng, train=True,
                           X_node=X)
            s = lt.score_links(p, cfg, h, rng=rng, train=True)
            return jnp.sum(jnp.log(s + 1e-6)) * 1e-6
        l, g = jax.value_and_grad(f, argnums=(0, 1))(dep(params, c), X0)
        gs = jax.tree_util.tree_leaves(g)[0]
        return jnp.tanh(l + jnp.sum(gs) * 1e-9)

    report("fwdX_fb", *_time_chained(
        jax, jnp, fwdX_fb, (params, X0, graph, src, tgt, rng0)))

    # -- one full forward (propagate inside), fwd+bwd ------------------
    def fwd_fb(c, params, graph, src, tgt, rng):
        def f(p):
            h = lt.forward(p, cfg, graph, src, tgt, rng=rng, train=True)
            s = lt.score_links(p, cfg, h, rng=rng, train=True)
            return jnp.sum(jnp.log(s + 1e-6)) * 1e-6
        l, g = jax.value_and_grad(f)(dep(params, c))
        gs = jax.tree_util.tree_leaves(g)[0]
        return jnp.tanh(l + jnp.sum(gs) * 1e-9)

    report("fwd_fb", *_time_chained(
        jax, jnp, fwd_fb, (params, graph, src, tgt, rng0)))

    # -- loss_fn (pos+neg) fwd+bwd, both propagate policies ------------
    for name, dp in (("loss_fb", True), ("loss_fb_dp0", False)):
        def lf(c, params, graph, src, tgt, nsrc, ntgt, w, rng, dp=dp):
            def f(p):
                return loss_fn(p, cfg, graph, src, tgt, nsrc, ntgt, w,
                               None, None, rng, double_propagate=dp)
            l, g = jax.value_and_grad(f)(dep(params, c))
            gs = jax.tree_util.tree_leaves(g)[0]
            return jnp.tanh(l * 1e-3 + jnp.sum(gs) * 1e-9)

        report(name, *_time_chained(
            jax, jnp, lf,
            (params, graph, src, tgt, neg_src, neg_tgt, w, rng0)))

    # -- full optimizer step, both propagate policies ------------------
    opt = make_optimizer(1e-3, steps_per_epoch=100)
    bin_w = (graph.edge_w > 0).astype(jnp.float32)
    for name, dp in (("step", True), ("step_dp0", False)):
        stepfn = make_train_step(cfg, opt, double_propagate=dp)
        state = TrainState(
            jax.tree_util.tree_map(lambda x: jnp.array(x), params),
            opt.init(params), jnp.asarray(0, jnp.int32))
        t0 = time.time()
        for _ in range(2):
            state, loss = stepfn(state, graph, ds.mask_mult_device, bin_w,
                                 src, tgt, w, rng0)
        float(loss)
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        for _ in range(8):
            state, loss = stepfn(state, graph, ds.mask_mult_device, bin_w,
                                 src, tgt, w, rng0)
        float(loss)
        report(name, (time.perf_counter() - t0) / 8, compile_s)

    # -- derived shares ------------------------------------------------
    r = results
    print(json.dumps({
        "derived_ms": {
            "gcn_fb_x2": round(2e3 * r["prop_fb"], 1),
            "pairwise_fb_x2": round(2e3 * r["fwdX_fb"], 1),
            "step_minus_loss": round(1e3 * (r["step"] - r["loss_fb"]), 1),
            "dp0_saving": round(1e3 * (r["step"] - r["step_dp0"]), 1),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
