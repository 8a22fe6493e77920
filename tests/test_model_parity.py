"""Full-model parity: jitted TPU pipeline vs the dense numpy oracle.

The oracle (tests/oracle.py) implements the reference equations with
dense matrices and per-link python loops. Identical parameters are fed to
both; eval-mode outputs must agree to float32 tolerance. This is the
activation-level parity check demanded by the north star (BASELINE.md).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import (
    LPFormerConfig,
    forward,
    init_lpformer,
    propagate,
    score_links,
)

from oracle import dense_adj, forward_oracle, gcn_forward, np_layer_norm, np_mlp


def _setup(mode_thresh, seed=0, **cfg_kw):
    ds = synthetic_dataset(
        seed=seed, num_nodes=70, num_train=260, num_eval=24, feat_dim=10,
        eps=1e-3,
    )
    t1, tn = mode_thresh
    kw = dict(
        dim=24, gnn_layers=2, thresh_cn=0.0, thresh_1hop=t1,
        thresh_non1hop=tn, budget_cn=70, budget_onehop=140,
        budget_non1hop=70,
    )
    kw.update(cfg_kw)
    cfg = LPFormerConfig(**kw)
    params = init_lpformer(jax.random.PRNGKey(seed + 7), cfg, in_dim=10)
    # dense references
    n = ds.num_nodes
    A_w = dense_adj(
        np.concatenate([ds.train_pos[:, 0], ds.train_pos[:, 1]]),
        np.concatenate([ds.train_pos[:, 1], ds.train_pos[:, 0]]),
        1.0, n,
    )
    adj_bin = (A_w > 0).astype(np.float64)
    nbrs = np.asarray(ds.graph.ppr_rows.nbrs)
    vals = np.asarray(ds.graph.ppr_rows.vals)
    ppr_dense = np.zeros((n, n + 1))
    for i in range(n):
        ppr_dense[i, nbrs[i]] = vals[i]
    ppr_dense = ppr_dense[:, :n]
    return ds, cfg, params, A_w, adj_bin, ppr_dense


def test_propagate_matches_dense_gcn():
    ds, cfg, params, A_w, _, _ = _setup((1e-3, 1e-3))
    got = np.asarray(propagate(params, cfg, ds.graph, train=False))
    X = gcn_forward(
        params["node_encoder"], A_w, np.asarray(ds.graph.x),
        layer_norm=cfg.layer_norm, residual=cfg.residual, relu=cfg.relu,
    )
    want = np_layer_norm(params["gnn_norm"], X)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize(
    "mode_thresh,label",
    [((1e-3, 1e-3), "all"), ((1e-3, 1), "1-hop"), ((1, 1), "cn")],
)
def test_forward_matches_oracle(mode_thresh, label):
    ds, cfg, params, A_w, adj_bin, ppr_dense = _setup(mode_thresh)
    assert cfg.mask_mode == label
    links = [(int(s), int(t)) for s, t in ds.valid_pos[:12]]
    # add an isolated-ish / degenerate pair
    links.append((int(ds.valid_pos[0, 0]), int(ds.valid_pos[0, 0])))
    src = jnp.asarray([s for s, _ in links])
    tgt = jnp.asarray([t for _, t in links])

    got = np.asarray(forward(params, cfg, ds.graph, src, tgt, train=False))
    want = forward_oracle(
        params, cfg, A_w, adj_bin, ppr_dense, np.asarray(ds.graph.x), links
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_forward_with_residual_relu_off():
    ds, cfg, params, A_w, adj_bin, ppr_dense = _setup(
        (1e-3, 1e-3), seed=5, residual=True, relu=False, gnn_layers=3
    )
    links = [(int(s), int(t)) for s, t in ds.valid_pos[:8]]
    src = jnp.asarray([s for s, _ in links])
    tgt = jnp.asarray([t for _, t in links])
    got = np.asarray(forward(params, cfg, ds.graph, src, tgt, train=False))
    want = forward_oracle(
        params, cfg, A_w, adj_bin, ppr_dense, np.asarray(ds.graph.x), links
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_forward_two_trans_layers():
    ds, cfg, params, A_w, adj_bin, ppr_dense = _setup(
        (1e-3, 1e-3), seed=6, trans_layers=2
    )
    links = [(int(s), int(t)) for s, t in ds.valid_pos[:8]]
    src = jnp.asarray([s for s, _ in links])
    tgt = jnp.asarray([t for _, t in links])
    got = np.asarray(forward(params, cfg, ds.graph, src, tgt, train=False))
    want = forward_oracle(
        params, cfg, A_w, adj_bin, ppr_dense, np.asarray(ds.graph.x), links
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_score_head():
    ds, cfg, params, *_ = _setup((1e-3, 1e-3))
    h = jnp.asarray(np.random.default_rng(0).standard_normal((6, cfg.out_dim)),
                    dtype=jnp.float32)
    got = np.asarray(score_links(params, cfg, h))
    want = np_mlp(params["score"], np.asarray(h, np.float64), sigmoid=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    assert got.shape == (6,)


def test_jit_consistency():
    """jitted forward == eager forward (static shapes compile once)."""
    ds, cfg, params, *_ = _setup((1e-3, 1e-3))
    src = jnp.asarray(ds.valid_pos[:8, 0])
    tgt = jnp.asarray(ds.valid_pos[:8, 1])
    eager = forward(params, cfg, ds.graph, src, tgt, train=False)
    jitted = jax.jit(
        lambda p, g, s, t: forward(p, cfg, g, s, t, train=False)
    )(params, ds.graph, src, tgt)
    np.testing.assert_allclose(
        np.asarray(eager), np.asarray(jitted), rtol=2e-5, atol=2e-6
    )


def test_forward_multi_head_matches_oracle():
    """num_heads=2: concat-head GATv2 attention (reference
    layers.py:179-181) through the XLA path vs the dense oracle — the
    Pallas kernel is heads==1-only and must auto-fall back here."""
    ds, cfg, params, A_w, adj_bin, ppr_dense = _setup(
        (1e-3, 1e-3), seed=9, num_heads=2
    )
    links = [(int(s), int(t)) for s, t in ds.valid_pos[:10]]
    src = jnp.asarray([s for s, _ in links])
    tgt = jnp.asarray([t for _, t in links])
    import dataclasses
    cfg_force = dataclasses.replace(cfg, use_pallas_attention=True)
    got = np.asarray(
        forward(params, cfg_force, ds.graph, src, tgt, train=False))
    want = forward_oracle(
        params, cfg, A_w, adj_bin, ppr_dense, np.asarray(ds.graph.x), links
    )
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
