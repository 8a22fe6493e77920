"""Context-parallel (context axis over 'graph') partition invariance.

The CP mode shards every link's context set across the 'graph' axis and
merges the per-shard flash statistics with a pmax/psum log-sum-exp — it
must reproduce the single-device loss/grads/scores exactly (up to float
reassociation). This is the sequence-parallel analog of SURVEY §2.4.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import LPFormerConfig, init_lpformer
from lpformer_tpu.ops import masking
from lpformer_tpu.parallel import (
    make_mesh,
    make_sharded_loss,
    make_sharded_propagate,
    make_sharded_score_with_X,
    make_sharded_train_step,
    partition_graph,
    place_sharded_graph,
)
from lpformer_tpu.train import make_optimizer
from lpformer_tpu.train.step import TrainState, loss_fn as single_loss_fn


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


@pytest.mark.parametrize("d,g", [(2, 4), (1, 8), (4, 2)])
def test_cp_loss_matches_single_device(d, g):
    assert len(jax.devices()) >= 8
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    want = float(_single_device_loss(ds, cfg, params, src, tgt, neg, w, rng))

    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
    sg = partition_graph(ds.graph, g=g, d=d)
    loss = jax.jit(
        make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                          sg.ctx_rows_per_shard, train=True,
                          context_parallel=True)
    )
    got = float(
        loss(params, sg, ds.mask_mult_device, src, tgt, w,
             neg[0], neg[1], w, rng)
    )
    assert abs(got - want) < 2e-4, f"cp {got} vs single {want}"


def test_cp_grads_match_single_device():
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    g_single = jax.jit(jax.grad(
        lambda p: _single_device_loss(ds, cfg, p, src, tgt, neg, w, rng)
    ))(params)

    mesh = make_mesh(data=2, graph=4)
    sg = partition_graph(ds.graph, g=4, d=2)
    loss = make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                             sg.ctx_rows_per_shard, train=True,
                             context_parallel=True)
    g_cp = jax.jit(jax.grad(
        lambda p: loss(p, sg, ds.mask_mult_device, src, tgt, w,
                       neg[0], neg[1], w, rng)
    ))(params)

    flat_a = jax.tree_util.tree_leaves(g_single)
    flat_b = jax.tree_util.tree_leaves(g_cp)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=5e-5
        )


def test_cp_train_step_descends():
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    mesh = make_mesh(data=2, graph=4)
    sg = place_sharded_graph(partition_graph(ds.graph, g=4, d=2), mesh)
    opt = make_optimizer(5e-3, steps_per_epoch=1)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_sharded_train_step(
        cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard,
        sg.ctx_rows_per_shard, context_parallel=True,
    )
    losses = []
    for _ in range(4):
        state, loss = step(state, sg, ds.mask_mult_device, src, tgt, w, rng)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_cp_eval_scores_match_single_device():
    from lpformer_tpu.models import forward as fwd, score_links

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    h = fwd(params, cfg, ds.graph, src, tgt, train=False)
    want = np.asarray(score_links(params, cfg, h, train=False))

    mesh = make_mesh(data=2, graph=4)
    sg = place_sharded_graph(partition_graph(ds.graph, g=4, d=2), mesh)
    prop = make_sharded_propagate(cfg, mesh, ds.num_nodes, sg.rows_per_shard)
    score_x, _ = make_sharded_score_with_X(
        cfg, mesh, ds.num_nodes, sg.ctx_rows_per_shard, context_parallel=True
    )
    got = np.asarray(score_x(params, sg, prop(params, sg), src, tgt))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_cp_rejects_indivisible_budgets():
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    bad = dataclasses.replace(cfg, budget_cn=10)  # 10 % 4 != 0
    mesh = make_mesh(data=2, graph=4)
    sg = partition_graph(ds.graph, g=4, d=2)
    with pytest.raises(ValueError, match="must divide"):
        make_sharded_loss(bad, mesh, ds.num_nodes, sg.rows_per_shard,
                          sg.ctx_rows_per_shard, context_parallel=True)


def test_cp_dropout_paths_run():
    """With dropout active, the cp loss must still be finite and stable
    across identical calls (rng folding is graph-axis-invariant)."""
    ds, cfg0, params, src, tgt, neg, w, rng = _setup()
    cfg = dataclasses.replace(
        cfg0, dropout=0.2, att_drop=0.2, gnn_drop=0.1, feat_drop=0.1
    )
    mesh = make_mesh(data=2, graph=4)
    sg = partition_graph(ds.graph, g=4, d=2)
    loss = jax.jit(
        make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                          sg.ctx_rows_per_shard, train=True,
                          context_parallel=True)
    )
    a = float(loss(params, sg, ds.mask_mult_device, src, tgt, w,
                   neg[0], neg[1], w, rng))
    b = float(loss(params, sg, ds.mask_mult_device, src, tgt, w,
                   neg[0], neg[1], w, rng))
    assert np.isfinite(a) and a == b
