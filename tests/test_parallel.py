"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Partition invariance: the sharded loss/grads over (data x graph) meshes
must match the single-device loss/grads (dropout off). The context
state (adj/PPR rows) is row-sharded over the FULL mesh and fetched per
batch with all_gather + psum_scatter — these tests are what certify the
collective row exchange delivers exactly the single-device semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, init_lpformer
from lpformer_tpu.parallel import (
    make_mesh,
    make_sharded_loss,
    make_sharded_propagate,
    make_sharded_score,
    make_sharded_train_step,
    partition_graph,
    place_sharded_graph,
)
from lpformer_tpu.train import make_optimizer
from lpformer_tpu.train.step import TrainState, loss_fn as single_loss_fn
from lpformer_tpu.ops import masking


def _setup(batch=32):
    ds = synthetic_dataset(
        seed=0, num_nodes=96, num_train=320, num_eval=32, feat_dim=12
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=2, budget_cn=24, budget_onehop=48,
        budget_non1hop=48, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        feat_drop=0.0, pred_drop=0.0,
    )
    params = init_lpformer(jax.random.PRNGKey(3), cfg, in_dim=12)
    src = jnp.asarray(ds.train_pos[:batch, 0])
    tgt = jnp.asarray(ds.train_pos[:batch, 1])
    rng = jax.random.PRNGKey(7)
    neg = jax.random.randint(rng, (2, batch), 0, ds.num_nodes, dtype=src.dtype)
    w = jnp.ones((batch,), jnp.float32)
    return ds, cfg, params, src, tgt, neg, w, rng


def _single_device_loss(ds, cfg, params, src, tgt, neg, w, rng):
    mask_ranks = masking.batch_mask_ranks(
        ds.graph.adj_rows, src, tgt, ds.mask_mult_device
    )
    return single_loss_fn(
        params, cfg, ds.graph, src, tgt, neg[0], neg[1], w,
        mask_ranks, None, rng, double_propagate=False,
    )


def test_collective_row_gather_roundtrip():
    """all_gather + owner-gather + psum_scatter must deliver each device
    exactly the rows its own ids request (the all_gather concatenation
    and psum_scatter scatter orders must agree on the flattened
    (data, graph) device order)."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from lpformer_tpu.parallel.sharded_step import _gather_ctx_rows

    d, g = 2, 4
    ndev = d * g
    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[:ndev])
    n, rows_per, k = 61, 8, 5          # 61 rows padded to 64 = 8 per dev
    table = jnp.arange(64 * k, dtype=jnp.int32).reshape(64, k)
    flags = (table % 3 == 0)[:, :k].astype(bool)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, n, size=ndev * 6).astype(np.int32))

    def inner(table, flags, ids):
        got_t, got_f = _gather_ctx_rows(ids, [table, flags], rows_per, g)
        return got_t, got_f

    got_t, got_f = jax.jit(shard_map(
        inner, mesh=mesh,
        in_specs=(P(("data", "graph"), None), P(("data", "graph"), None),
                  P(("data", "graph"))),
        out_specs=(P(("data", "graph"), None), P(("data", "graph"), None)),
        check_vma=False,
    ))(table, flags, ids)
    np.testing.assert_array_equal(np.asarray(got_t), np.asarray(table)[ids])
    np.testing.assert_array_equal(np.asarray(got_f), np.asarray(flags)[ids])
    assert got_f.dtype == jnp.bool_


def test_context_state_is_row_sharded():
    """Per-device context state must shrink ~1/ndev (the citation2
    memory fix): the sharded tables' addressable shards hold
    ctx_rows_per_shard rows each, not N."""
    ds, *_ = _setup()
    d, g = 2, 4
    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
    sg = place_sharded_graph(partition_graph(ds.graph, g=g, d=d), mesh)
    ndev = d * g
    assert sg.ctx_rows_per_shard * ndev >= ds.num_nodes
    assert sg.adj_nbrs.shape[0] == sg.ctx_rows_per_shard * ndev
    for arr in (sg.adj_nbrs, sg.ppr_nbrs, sg.ppr_vals):
        shards = arr.addressable_shards
        assert len(shards) == ndev
        for s in shards:
            assert s.data.shape[0] == sg.ctx_rows_per_shard, (
                f"shard holds {s.data.shape[0]} rows, expected "
                f"{sg.ctx_rows_per_shard} (state not row-sharded!)"
            )


@pytest.mark.parametrize("d,g", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_loss_matches_single_device(d, g):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    want = float(_single_device_loss(ds, cfg, params, src, tgt, neg, w, rng))

    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
    sg = partition_graph(ds.graph, g=g, d=d)
    loss = jax.jit(
        make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                          sg.ctx_rows_per_shard, train=True)
    )
    got = float(
        loss(params, sg, ds.mask_mult_device, src, tgt, w,
             neg[0], neg[1], w, rng)
    )
    assert abs(got - want) < 2e-4, f"sharded {got} vs single {want}"


def test_sharded_grads_match_single_device():
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    g_single = jax.jit(jax.grad(
        lambda p: _single_device_loss(ds, cfg, p, src, tgt, neg, w, rng)
    ))(params)

    mesh = make_mesh(data=2, graph=4)
    sg = partition_graph(ds.graph, g=4, d=2)
    loss = make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                             sg.ctx_rows_per_shard, train=True)
    g_shard = jax.jit(jax.grad(
        lambda p: loss(p, sg, ds.mask_mult_device, src, tgt, w,
                       neg[0], neg[1], w, rng)
    ))(params)

    flat_a = jax.tree_util.tree_leaves(g_single)
    flat_b = jax.tree_util.tree_leaves(g_shard)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )


def test_sharded_train_step_runs_and_descends():
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    mesh = make_mesh(data=2, graph=4)
    sg = place_sharded_graph(partition_graph(ds.graph, g=4, d=2), mesh)
    opt = make_optimizer(5e-3, steps_per_epoch=1)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_sharded_train_step(
        cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard,
        sg.ctx_rows_per_shard,
    )
    losses = []
    for _ in range(4):
        state, loss = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_encoder_dropout_invariant_to_data_axis():
    """With ONLY encoder dropout active (feat/gnn), the sharded loss must
    not depend on the data-axis size: encoder rngs fold only the graph
    index, so (1, g) and (2, g) meshes see identical dropped activations
    (regression for the data-axis dropout divergence bug)."""
    ds, cfg0, params, src, tgt, neg, w, rng = _setup()
    import dataclasses

    cfg = dataclasses.replace(cfg0, gnn_drop=0.3, feat_drop=0.2)

    losses = {}
    for d, g in ((1, 4), (2, 4)):
        mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
        sg = partition_graph(ds.graph, g=g, d=d)
        loss = jax.jit(
            make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                              sg.ctx_rows_per_shard, train=True)
        )
        losses[(d, g)] = float(
            loss(params, sg, ds.mask_mult_device, src, tgt, w,
                 neg[0], neg[1], w, rng)
        )
    assert abs(losses[(1, 4)] - losses[(2, 4)]) < 2e-4, losses


def test_sharded_eval_matches_single_device():
    from lpformer_tpu.models import forward as fwd, score_links

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    h = fwd(params, cfg, ds.graph, src, tgt, train=False)
    want = np.asarray(score_links(params, cfg, h, train=False))

    mesh = make_mesh(data=2, graph=4)
    sg = place_sharded_graph(partition_graph(ds.graph, g=4, d=2), mesh)
    score = make_sharded_score(
        cfg, mesh, ds.num_nodes, sg.rows_per_shard, sg.ctx_rows_per_shard
    )
    got = np.asarray(score(params, sg, src, tgt))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_sharded_propagate_once_reuse():
    """make_sharded_propagate + make_sharded_score_with_X == one-call
    scorer (the propagate-once eval path)."""
    from lpformer_tpu.parallel import make_sharded_score_with_X

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    mesh = make_mesh(data=2, graph=4)
    sg = place_sharded_graph(partition_graph(ds.graph, g=4, d=2), mesh)
    prop = make_sharded_propagate(cfg, mesh, ds.num_nodes, sg.rows_per_shard)
    score_x, _ = make_sharded_score_with_X(
        cfg, mesh, ds.num_nodes, sg.ctx_rows_per_shard
    )
    X = prop(params, sg)
    got = np.asarray(score_x(params, sg, X, src, tgt))
    one_call = make_sharded_score(
        cfg, mesh, ds.num_nodes, sg.rows_per_shard, sg.ctx_rows_per_shard
    )
    want = np.asarray(one_call(params, sg, src, tgt))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_trainer_mesh_path_end_to_end():
    """train_loop with TrainArgs.mesh='2,4' must run epochs + sharded
    eval; run_eval over the mesh must match single-device run_eval on
    the same params."""
    from lpformer_tpu.train.trainer import TrainArgs, run_eval, train_loop
    from lpformer_tpu.parallel.eval import ShardedEvalContext
    from lpformer_tpu.utils.logger import ResultsLogger

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    args = TrainArgs(
        epochs=2, eval_steps=1, batch_size=32, test_batch_size=64,
        metric="MRR", verbose=False, mesh="2,4", lr=5e-3,
    )
    loggers = {
        "Hits@20": ResultsLogger(1), "Hits@50": ResultsLogger(1),
        "Hits@100": ResultsLogger(1), "MRR": ResultsLogger(1),
    }
    best = train_loop(args, cfg, ds, loggers, seed=0)
    assert best > 0.0

    # eval parity: mesh vs single device on identical params
    mesh = make_mesh(data=2, graph=4)
    ctx = ShardedEvalContext(cfg, mesh, ds)
    got = run_eval(params, cfg, ds, args, sharded=ctx)
    want = run_eval(params, cfg, ds, args, sharded=None)
    for k in want:
        for a, b in zip(got[k], want[k]):
            assert abs(a - b) < 2e-3, (k, got[k], want[k])


def test_mesh_multi_step_matches_sequential():
    """steps_per_call>1 on the mesh: K scanned optimizer steps in one
    program equal K sequential sharded-step launches (same rng scheme:
    the per-step fold is on state.step), incl. a dead padded tail."""
    import optax
    from lpformer_tpu.parallel import (
        make_sharded_train_step, partition_graph, place_sharded_graph,
    )
    from lpformer_tpu.train import make_optimizer
    from lpformer_tpu.train.step import TrainState
    from lpformer_tpu.models import init_lpformer

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    mesh = make_mesh(data=2, graph=2, devices=jax.devices()[:4])
    sg = place_sharded_graph(partition_graph(ds.graph, g=2, d=2), mesh)
    opt = make_optimizer(5e-3, steps_per_epoch=10)
    mult = ds.mask_mult_device
    common = dict(num_nodes=ds.num_nodes, rows_per=sg.rows_per_shard,
                  ctx_rows_per=sg.ctx_rows_per_shard)

    tp = np.asarray(ds.train_pos)
    k, b = 3, 32
    srcs = jnp.asarray(tp[: k * b, 0].reshape(k, b))
    tgts = jnp.asarray(tp[: k * b, 1].reshape(k, b))
    ws = jnp.ones((k, b), jnp.float32)
    live = jnp.asarray([1.0, 1.0, 0.0])
    key = jax.random.PRNGKey(7)

    step1 = make_sharded_train_step(cfg, opt, mesh, **common)
    st = TrainState(jax.tree_util.tree_map(jnp.array, params),
                    opt.init(params), jnp.asarray(0, jnp.int32))
    seq_losses = []
    for i in range(2):  # only the live steps
        st, l = step1(st, sg, mult, srcs[i], tgts[i], ws[i], key)
        seq_losses.append(float(l))

    stepk = make_sharded_train_step(cfg, opt, mesh, steps_per_call=k,
                                    **common)
    st2 = TrainState(jax.tree_util.tree_map(jnp.array, params),
                     opt.init(params), jnp.asarray(0, jnp.int32))
    st2, losses = stepk(st2, sg, mult, srcs, tgts, ws, live, key)
    np.testing.assert_allclose(
        np.asarray(losses)[:2], seq_losses, rtol=1e-5)
    assert float(losses[2]) == 0.0
    assert int(st2.step) == int(st.step)  # dead tail left the counter
    for a, b_ in zip(jax.tree_util.tree_leaves(st.params),
                     jax.tree_util.tree_leaves(st2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=1e-6)


def test_mesh_grouped_eval_matches_per_batch():
    """score_group (lax.scan over the shard_map scorer) must equal the
    per-batch sharded program across group boundaries and the padded
    tail — the mesh analog of
    test_eval_flows.test_grouped_eval_scoring_matches_per_batch."""
    from lpformer_tpu.evalx import harness
    from lpformer_tpu.parallel.eval import ShardedEvalContext

    ds, cfg, params, *_ = _setup()
    mesh = make_mesh(data=2, graph=4)
    ctx = ShardedEvalContext(cfg, mesh, ds)
    X = ctx.prop(params, ctx.sg)

    rng = np.random.default_rng(5)
    edges = np.stack(
        [rng.integers(0, ds.num_nodes, 300),
         rng.integers(0, ds.num_nodes, 300)], axis=1
    )
    kw = dict(batch_size=16)  # 300 edges -> 2 groups of 8 + tail
    base = harness.score_edges(
        ctx.score, params, ctx.sg, X, edges, group_fn=None, **kw)
    grouped = harness.score_edges(
        ctx.score, params, ctx.sg, X, edges,
        group_fn=ctx.score_group, **kw)
    np.testing.assert_allclose(grouped, base, rtol=1e-6, atol=1e-7)

    # and the harness auto-wires the grouped scorer on the mesh path
    got = harness.test_standard(
        params, cfg, ds, batch_size=16, with_mrr=True, sharded=ctx)
    want = harness.test_standard(
        params, cfg, ds, batch_size=16, with_mrr=True)
    for a, b in zip(got["MRR"], want["MRR"]):
        assert abs(a - b) < 2e-3, (got["MRR"], want["MRR"])


def test_sharded_mask_input_loss_matches_single_device():
    """The mesh mask_input path (in-jit masked renorm + double
    propagation, sharded_step.make_sharded_loss(mask_input=True)) must
    reproduce the single-device --mask-input loss on every mesh shape."""
    ds = synthetic_dataset(
        seed=0, num_nodes=96, num_train=320, num_eval=32, feat_dim=12,
        mask_input=True,
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=2, budget_cn=24, budget_onehop=48,
        budget_non1hop=48, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
        feat_drop=0.0, pred_drop=0.0,
    )
    params = init_lpformer(jax.random.PRNGKey(3), cfg, in_dim=12)
    batch = 32
    src = jnp.asarray(ds.train_pos[:batch, 0])
    tgt = jnp.asarray(ds.train_pos[:batch, 1])
    rng = jax.random.PRNGKey(7)
    neg = jax.random.randint(rng, (2, batch), 0, ds.num_nodes, dtype=src.dtype)
    w = jnp.ones((batch,), jnp.float32)

    mask_ranks = masking.batch_mask_ranks(
        ds.graph.adj_rows, src, tgt, ds.mask_mult_device, weight=w
    )
    bin_w = (ds.graph.edge_w > 0).astype(jnp.float32)
    prop_w = masking.mask_edge_weights(
        mask_ranks, ds.graph.edge_rank, bin_w
    )
    # the masked adjacency must actually differ, or this test is vacuous
    assert float(jnp.sum(prop_w)) < float(jnp.sum(bin_w))
    want = float(single_loss_fn(
        params, cfg, ds.graph, src, tgt, neg[0], neg[1], w,
        mask_ranks, prop_w, rng, True,
    ))
    # and differ from the unmasked loss (the renorm path is live)
    base = float(_single_device_loss(ds, cfg, params, src, tgt, neg, w, rng))
    assert abs(want - base) > 1e-6

    for d, g in ((2, 4), (1, 8), (8, 1)):
        mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
        sg = partition_graph(ds.graph, g=g, d=d, mask_input=True)
        loss = jax.jit(
            make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                              sg.ctx_rows_per_shard, train=True,
                              mask_input=True)
        )
        got = float(
            loss(params, sg, ds.mask_mult_device, src, tgt, w,
                 neg[0], neg[1], w, rng)
        )
        assert abs(got - want) < 2e-4, (d, g, got, want)


def test_sharded_loss_combined_context_matches_single_device():
    """budget_combined flows through the sharded step (extraction runs
    on collectively fetched rows): mesh loss == single-device loss."""
    import dataclasses

    ds, cfg0, params, src, tgt, neg, w, rng = _setup()
    cfg = dataclasses.replace(
        cfg0, budget_combined=cfg0.context.total_budget)
    want = float(_single_device_loss(ds, cfg, params, src, tgt, neg, w, rng))
    # and the combined table really is in play (same loss as classic,
    # since the budget admits every entry)
    base = float(_single_device_loss(ds, cfg0, params, src, tgt, neg, w, rng))
    assert abs(want - base) < 2e-4

    for d, g in ((2, 4), (8, 1)):
        mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
        sg = partition_graph(ds.graph, g=g, d=d)
        loss = jax.jit(
            make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                              sg.ctx_rows_per_shard, train=True)
        )
        got = float(
            loss(params, sg, ds.mask_mult_device, src, tgt, w,
                 neg[0], neg[1], w, rng)
        )
        assert abs(got - want) < 2e-4, (d, g, got, want)
