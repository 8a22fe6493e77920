"""Combined (class-tagged) context table: ContextConfig.budget_combined.

The combined table must carry EXACTLY the same context sets as the
classic per-class blocks whenever its budget admits every valid entry,
truncate globally by top-(ppr_s + ppr_t) under pressure, and produce the
same model outputs through both the XLA fallback and the mixed-class
Pallas kernel (interpret mode on CPU).
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.models import (
    LPFormerConfig, forward, init_lpformer, score_links,
)
from lpformer_tpu.ops.context import extract_context


MODES = {"all": (1e-3, 1e-3), "1-hop": (1e-3, 1), "cn": (1, 1)}


def _setup(mode="all", budget_combined=None, seed=0):
    ds = synthetic_dataset(
        seed=seed, num_nodes=80, num_train=300, num_eval=24, feat_dim=12,
        eps=1e-3,
    )
    t1, tn = MODES[mode]
    cfg = LPFormerConfig(
        dim=16, gnn_layers=2, thresh_cn=0.0, thresh_1hop=t1,
        thresh_non1hop=tn, budget_cn=80, budget_onehop=160,
        budget_non1hop=80, budget_combined=budget_combined,
        dropout=0.0, gnn_drop=0.0, att_drop=0.0, feat_drop=0.0,
        use_pallas_attention=False,
    )
    src = jnp.asarray(ds.valid_pos[:16, 0])
    tgt = jnp.asarray(ds.valid_pos[:16, 1])
    return ds, cfg, src, tgt


def _ctx_sets(ds, cfg, src, tgt):
    ctx = extract_context(
        ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, cfg.context,
        train=False,
    )
    ids = np.asarray(ctx.ids)
    cls = np.asarray(ctx.cls)
    ps = np.asarray(ctx.src_ppr)
    pt = np.asarray(ctx.tgt_ppr)
    valid = np.asarray(ctx.valid)
    out = {}
    for b in range(ids.shape[0]):
        for c in range(ids.shape[1]):
            if valid[b, c]:
                key = (b, int(ids[b, c]))
                assert key not in out, f"duplicate context entry {key}"
                out[key] = (
                    int(cls[b, c]), round(float(ps[b, c]), 6),
                    round(float(pt[b, c]), 6),
                )
    return out, ctx


@pytest.mark.parametrize("mode", ["all", "1-hop", "cn"])
def test_combined_matches_classic_sets(mode):
    """budget_combined >= total valid -> identical (id, cls, ppr) sets."""
    ds, cfg, src, tgt = _setup(mode)
    classic, cctx = _ctx_sets(ds, cfg, src, tgt)
    cfg2 = dataclasses.replace(cfg, budget_combined=cfg.context.total_budget)
    combined, mctx = _ctx_sets(ds, cfg2, src, tgt)
    assert classic == combined
    # counts and (zero) overflow agree
    np.testing.assert_array_equal(
        np.asarray(cctx.counts), np.asarray(mctx.counts))
    assert int(np.asarray(mctx.overflow).sum()) == 0
    assert mctx.ids.shape[1] == cfg.context.total_budget


def test_combined_truncation_keeps_global_top_ppr():
    ds, cfg, src, tgt = _setup("all")
    full, _ = _ctx_sets(ds, cfg, src, tgt)
    budget = 4
    cfg2 = dataclasses.replace(cfg, budget_combined=budget)
    small, sctx = _ctx_sets(ds, cfg2, src, tgt)
    over = np.asarray(sctx.overflow)
    for b in range(16):
        entries = {k[1]: v for k, v in full.items() if k[0] == b}
        kept = {k[1]: v for k, v in small.items() if k[0] == b}
        assert len(kept) == min(len(entries), budget)
        assert over[b] == max(len(entries) - budget, 0)
        if len(entries) > budget:
            # every kept entry's ppr sum >= every dropped entry's
            kept_min = min(v[1] + v[2] for v in kept.values())
            dropped = {v: entries[v] for v in entries if v not in kept}
            for v, e in dropped.items():
                assert e[1] + e[2] <= kept_min + 1e-9
        else:
            assert kept == entries


@pytest.mark.parametrize("mode", ["all", "1-hop", "cn"])
def test_combined_forward_matches_classic(mode):
    """Same model outputs (eval mode) through the XLA path when the
    combined budget admits everything — attention is order-invariant."""
    ds, cfg, src, tgt = _setup(mode)
    params = init_lpformer(jax.random.PRNGKey(3), cfg, in_dim=12)
    h_classic = np.asarray(
        forward(params, cfg, ds.graph, src, tgt, train=False))
    cfg2 = dataclasses.replace(cfg, budget_combined=cfg.context.total_budget)
    h_combined = np.asarray(
        forward(params, cfg2, ds.graph, src, tgt, train=False))
    np.testing.assert_allclose(h_combined, h_classic, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("mode", ["all", "1-hop", "cn"])
def test_mixed_kernel_matches_xla_path(mode):
    """The mixed-class Pallas kernel (interpret mode on CPU) must agree
    with the XLA dense-masked path on the combined table."""
    ds, cfg, src, tgt = _setup(mode)
    # tile-aligned combined budget (kernel forces min_tile=8 when forced)
    cb = -(-cfg.context.total_budget // 8) * 8
    cfg_x = dataclasses.replace(cfg, budget_combined=cb)
    cfg_p = dataclasses.replace(
        cfg, budget_combined=cb, use_pallas_attention=True)
    params = init_lpformer(jax.random.PRNGKey(3), cfg_x, in_dim=12)
    h_x = np.asarray(forward(params, cfg_x, ds.graph, src, tgt, train=False))
    h_p = np.asarray(forward(params, cfg_p, ds.graph, src, tgt, train=False))
    np.testing.assert_allclose(h_p, h_x, rtol=5e-4, atol=5e-5)


def test_mixed_kernel_grads_match_xla_path():
    ds, cfg, src, tgt = _setup("all")
    cb = -(-cfg.context.total_budget // 8) * 8
    cfg_x = dataclasses.replace(cfg, budget_combined=cb)
    cfg_p = dataclasses.replace(
        cfg, budget_combined=cb, use_pallas_attention=True)
    params = init_lpformer(jax.random.PRNGKey(3), cfg_x, in_dim=12)

    def loss(params, cfg):
        h = forward(params, cfg, ds.graph, src, tgt, train=False)
        return jnp.sum(score_links(params, cfg, h) ** 2)

    g_x = jax.grad(loss)(params, cfg_x)
    g_p = jax.grad(loss)(params, cfg_p)
    leaves_x, tdef_x = jax.tree_util.tree_flatten(g_x)
    leaves_p, tdef_p = jax.tree_util.tree_flatten(g_p)
    assert tdef_x == tdef_p
    paths = jax.tree_util.tree_leaves_with_path(g_x)
    for (path, a), b in zip(paths, leaves_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(path)}",
        )


def test_combined_truncated_still_finite_and_scores():
    """Severe combined truncation must stay numerically sane end-to-end."""
    ds, cfg, src, tgt = _setup("all", budget_combined=8)
    params = init_lpformer(jax.random.PRNGKey(0), cfg, in_dim=12)
    h = forward(params, cfg, ds.graph, src, tgt, train=False)
    s = np.asarray(score_links(params, cfg, h))
    assert np.isfinite(s).all()
    assert ((s > 0) & (s < 1)).all()
