"""Multi-device sharding tests on the 8-virtual-CPU mesh.

Partition invariance: the sharded loss/grads over (data x graph) meshes
must match the single-device loss/grads (dropout off).
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
    make_sharded_train_step,
    partition_graph,
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


@pytest.mark.parametrize("d,g", [(2, 4), (4, 2), (8, 1), (1, 8)])
def test_sharded_loss_matches_single_device(d, g):
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    want = float(_single_device_loss(ds, cfg, params, src, tgt, neg, w, rng))

    mesh = make_mesh(data=d, graph=g, devices=jax.devices()[: d * g])
    sg = partition_graph(ds.graph, g=g, d=d)
    loss = jax.jit(
        make_sharded_loss(cfg, mesh, ds.num_nodes, sg.rows_per_shard,
                          train=True)
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
                             train=True)
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
    sg = partition_graph(ds.graph, g=4, d=2)
    opt = make_optimizer(5e-3, steps_per_epoch=1)
    state = TrainState(params, opt.init(params), jnp.asarray(0, jnp.int32))
    step = make_sharded_train_step(
        cfg, opt, mesh, ds.num_nodes, sg.rows_per_shard
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
                              train=True)
        )
        losses[(d, g)] = float(
            loss(params, sg, ds.mask_mult_device, src, tgt, w,
                 neg[0], neg[1], w, rng)
        )
    assert abs(losses[(1, 4)] - losses[(2, 4)]) < 2e-4, losses


def test_sharded_eval_matches_single_device():
    from lpformer_tpu.parallel import make_sharded_score
    from lpformer_tpu.models import forward as fwd, score_links

    ds, cfg, params, src, tgt, neg, w, rng = _setup()
    h = fwd(params, cfg, ds.graph, src, tgt, train=False)
    want = np.asarray(score_links(params, cfg, h, train=False))

    mesh = make_mesh(data=2, graph=4)
    sg = partition_graph(ds.graph, g=4, d=2)
    score = make_sharded_score(cfg, mesh, ds.num_nodes, sg.rows_per_shard)
    got = np.asarray(score(params, sg, src, tgt))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
