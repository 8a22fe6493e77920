"""Eval-flow tests: use-val-in-test dual graphs, citation2 mode,
multi-negative training."""
import numpy as np
import jax
import jax.numpy as jnp

from lpformer_tpu.data.dataset import LinkPredDataset, build_graph_bundle
from lpformer_tpu.data.synthetic import random_edges, synthetic_dataset
from lpformer_tpu.evalx import harness
from lpformer_tpu.graph import ppr as ppr_mod
from lpformer_tpu.models import LPFormerConfig, init_lpformer
from lpformer_tpu.ops import masking


def _dual_graph_dataset(seed=0, n=80):
    rng = np.random.default_rng(seed)
    train = random_edges(rng, n, 260)
    valid = random_edges(rng, n, 30)
    test = random_edges(rng, n, 30)
    x = rng.standard_normal((n, 8)).astype(np.float32)
    uniq, _ = masking.train_edge_info(train[:, 0], train[:, 1], n)

    src = np.concatenate([train[:, 0], train[:, 1]])
    dst = np.concatenate([train[:, 1], train[:, 0]])
    ppr_csr = ppr_mod.ppr_push_csr(src, dst, n, 0.15, 1e-3)
    g_train = build_graph_bundle(
        x, train[:, 0], train[:, 1], None, n, ppr_csr, mask_uniq_keys=uniq
    )
    # full graph includes validation edges (use-val-in-test)
    full = np.concatenate([train, valid], axis=0)
    fsrc = np.concatenate([full[:, 0], full[:, 1]])
    fdst = np.concatenate([full[:, 1], full[:, 0]])
    ppr_full = ppr_mod.ppr_push_csr(fsrc, fdst, n, 0.15, 1e-3)
    g_test = build_graph_bundle(
        x, full[:, 0], full[:, 1], None, n, ppr_full, mask_uniq_keys=uniq
    )
    idx = rng.permutation(len(train))[: len(valid)]
    return LinkPredDataset(
        name="dualtest", num_nodes=n, graph=g_train, graph_test=g_test,
        train_pos=train, train_pos_val=train[idx], valid_pos=valid,
        valid_neg=random_edges(rng, n, 30), test_pos=test,
        test_neg=random_edges(rng, n, 30), metric="Hits@50",
    )


def test_use_val_in_test_eval_uses_full_graph():
    ds = _dual_graph_dataset()
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32,
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    r = harness.test_standard(params, cfg, ds, batch_size=64, with_mrr=True)
    assert "Hits@50" in r and "MRR" in r
    # test positives scored on the FULL graph must differ from scoring on
    # the train graph (validation edges change contexts/propagation)
    sf = harness._score_fn(cfg)
    prop = harness._propagate_fn(cfg)
    X_tr = prop(params, ds.graph)
    X_fu = prop(params, ds.graph_test)
    s_tr = harness.score_edges(sf, params, ds.graph, X_tr,
                               np.asarray(ds.test_pos), 64)
    s_fu = harness.score_edges(sf, params, ds.graph_test, X_fu,
                               np.asarray(ds.test_pos), 64)
    assert np.abs(s_tr - s_fu).max() > 1e-6


def test_citation2_eval_mode():
    ds = synthetic_dataset(
        seed=1, num_nodes=90, num_train=300, num_eval=20, feat_dim=8
    )
    # citation2-style negatives: [P, K] target ids
    rng = np.random.default_rng(2)
    ds.valid_neg = rng.integers(0, 90, (20, 7))
    ds.test_neg = rng.integers(0, 90, (20, 7))
    ds.name = "ogbl-citation2-like"
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32,
    )
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=8)
    r = harness.test_citation2(params, cfg, ds, batch_size=64)
    assert "MRR" in r and len(r["MRR"]) == 3
    # reference quirk: train slot equals valid slot (testing.py:70)
    assert r["MRR"][0] == r["MRR"][1]


def test_multi_negative_training():
    from lpformer_tpu.train.trainer import TrainArgs, train_data

    ds = synthetic_dataset(
        seed=3, num_nodes=100, num_train=300, num_eval=24, feat_dim=8
    )
    args = TrainArgs(
        epochs=2, lr=5e-3, batch_size=128, test_batch_size=128,
        eval_steps=2, runs=1, metric="MRR", verbose=False,
        num_negative=3, data_name="synv",
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32, dropout=0.0, gnn_drop=0.0, att_drop=0.0,
    )
    best, _, _ = train_data(args, cfg, ds)
    assert best > 0


def test_grouped_eval_scoring_matches_per_batch():
    """The EVAL_GROUP lax.scan device loop scores identically to the
    per-batch program, across group boundaries and the padded tail."""
    ds = synthetic_dataset(
        seed=11, num_nodes=100, num_train=350, num_eval=30, feat_dim=8
    )
    cfg = LPFormerConfig(
        dim=16, gnn_layers=1, budget_cn=16, budget_onehop=32,
        budget_non1hop=32,
    )
    params = init_lpformer(jax.random.PRNGKey(2), cfg, in_dim=8)
    rng = np.random.default_rng(3)
    edges = np.stack([rng.integers(0, 100, 300),
                      rng.integers(0, 100, 300)], axis=1).astype(np.int32)
    X = harness._propagate_fn(cfg)(params, ds.graph)
    kw = dict(batch_size=16)  # 300 edges -> 2 groups of 8 + tail
    base = harness.score_edges(
        harness._score_fn(cfg), params, ds.graph, X, edges, **kw)
    grouped = harness.score_edges(
        harness._score_fn(cfg), params, ds.graph, X, edges,
        group_fn=harness._score_group_fn(cfg), **kw)
    np.testing.assert_allclose(grouped, base, rtol=1e-6, atol=1e-7)
