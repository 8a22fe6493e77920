"""Context extraction vs the dense python-set oracle.

Covers all three mask modes, batch-edge masking with duplicate-edge
multiplicities, threshold semantics (including zero-PPR CNs kept at
thresh_cn=0), and budget truncation/overflow accounting.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.graph import ppr as ppr_mod
from lpformer_tpu.ops import masking
from lpformer_tpu.ops.context import ContextConfig, extract_context

from oracle import context_sets, dense_adj


def _dense_ppr_from_rows(ppr_rows):
    n, k = ppr_rows.nbrs.shape
    dense = np.zeros((n, n + 1), dtype=np.float64)
    nbrs = np.asarray(ppr_rows.nbrs)
    vals = np.asarray(ppr_rows.vals)
    for i in range(n):
        dense[i, nbrs[i]] = vals[i]
    return dense[:, :n]


def _tables_to_sets(ctx):
    """Invert ContextTables into per-link {cls: {(v): (ps, pt)}}."""
    ids = np.asarray(ctx.ids)
    cls = np.asarray(ctx.cls)
    ps = np.asarray(ctx.src_ppr)
    pt = np.asarray(ctx.tgt_ppr)
    valid = np.asarray(ctx.valid)
    out = []
    names = {2: "cn", 1: "1hop", 3: "non1hop"}
    for b in range(ids.shape[0]):
        d = {"cn": {}, "1hop": {}, "non1hop": {}}
        for j in range(ids.shape[1]):
            if valid[b, j]:
                d[names[int(cls[b, j])]][int(ids[b, j])] = (
                    float(ps[b, j]),
                    float(pt[b, j]),
                )
        out.append(d)
    return out


def _dataset(**kw):
    return synthetic_dataset(
        seed=3, num_nodes=80, num_train=300, num_eval=30, feat_dim=8,
        eps=1e-3, **kw,
    )


@pytest.mark.parametrize(
    "mode,thresh_1hop,thresh_non1hop",
    [("all", 1e-3, 1e-3), ("1-hop", 1e-3, 1), ("cn", 1, 1)],
)
def test_context_matches_oracle(mode, thresh_1hop, thresh_non1hop):
    ds = _dataset()
    n = ds.num_nodes
    cfg = ContextConfig.from_thresholds(
        0.0, thresh_1hop, thresh_non1hop,
        budget_cn=80, budget_onehop=160, budget_non1hop=80,
    )
    assert cfg.mask_mode == mode

    adj_bin = (
        dense_adj(
            np.concatenate([ds.train_pos[:, 0], ds.train_pos[:, 1]]),
            np.concatenate([ds.train_pos[:, 1], ds.train_pos[:, 0]]),
            1.0, n,
        ) > 0
    ).astype(np.float64)
    ppr_dense = _dense_ppr_from_rows(ds.graph.ppr_rows)

    links = [(int(s), int(t)) for s, t in ds.valid_pos[:20]]
    src = jnp.asarray([s for s, _ in links])
    tgt = jnp.asarray([t for _, t in links])
    ctx = extract_context(
        ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, cfg
    )
    got = _tables_to_sets(ctx)
    counts = np.asarray(ctx.counts)
    assert int(np.asarray(ctx.overflow).sum()) == 0

    for i, (s, t) in enumerate(links):
        want = context_sets(
            adj_bin, adj_bin, ppr_dense, s, t, mode,
            0.0, thresh_1hop, thresh_non1hop,
        )
        for cls_name in ("cn", "1hop", "non1hop"):
            want_ids = {v for v, _, _ in want[cls_name]}
            assert set(got[i][cls_name].keys()) == want_ids, (
                f"link {i} ({s},{t}) class {cls_name}"
            )
            for v, ps, pt in want[cls_name]:
                gps, gpt = got[i][cls_name][v]
                assert abs(gps - ps) < 1e-6 and abs(gpt - pt) < 1e-6
        n_cn, n_1h, n_n1, n_nb = (
            len(want["cn"]), len(want["1hop"]), len(want["non1hop"]),
            len(want["cn"]) + len(want["1hop"]),
        )
        assert counts[i, 0] == n_cn
        if mode != "cn":
            assert counts[i, 1] == n_1h
            assert counts[i, 3] == n_nb
        if mode == "all":
            assert counts[i, 2] == n_n1


def test_context_with_batch_masking():
    """Masked batch edges must vanish from CN/1-hop but not >1-hop
    exclusion (reference train_model.py:38-45 + get_non_1hop_ppr NOTE)."""
    ds = _dataset()
    n = ds.num_nodes
    cfg = ContextConfig.from_thresholds(
        0.0, 1e-3, 1e-3, budget_cn=80, budget_onehop=160, budget_non1hop=80
    )
    batch_idx = np.arange(24)
    batch = ds.train_pos[batch_idx]
    src = jnp.asarray(batch[:, 0])
    tgt = jnp.asarray(batch[:, 1])
    mr = masking.batch_mask_ranks(
        ds.graph.adj_rows, src, tgt, ds.mask_mult_device
    )
    ctx = extract_context(
        ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, cfg, mask_ranks=mr
    )
    got = _tables_to_sets(ctx)

    # oracle masked adjacency: support of remaining train edges, symmetric
    keep = np.ones(len(ds.train_pos), dtype=bool)
    keep[batch_idx] = False
    kept = ds.train_pos[keep]
    adj_masked = (
        dense_adj(
            np.concatenate([kept[:, 0], kept[:, 1]]),
            np.concatenate([kept[:, 1], kept[:, 0]]),
            1.0, n,
        ) > 0
    ).astype(np.float64)
    adj_unmasked = (
        dense_adj(
            np.concatenate([ds.train_pos[:, 0], ds.train_pos[:, 1]]),
            np.concatenate([ds.train_pos[:, 1], ds.train_pos[:, 0]]),
            1.0, n,
        ) > 0
    ).astype(np.float64)
    ppr_dense = _dense_ppr_from_rows(ds.graph.ppr_rows)

    for i in range(len(batch)):
        s, t = int(batch[i, 0]), int(batch[i, 1])
        want = context_sets(
            adj_masked, adj_unmasked, ppr_dense, s, t, "all",
            0.0, 1e-3, 1e-3,
        )
        for cls_name in ("cn", "1hop", "non1hop"):
            want_ids = {v for v, _, _ in want[cls_name]}
            got_ids = set(got[i][cls_name].keys())
            assert got_ids == want_ids, (
                f"link {i} ({s},{t}) class {cls_name}: "
                f"extra {got_ids - want_ids} missing {want_ids - got_ids}"
            )


def test_duplicate_edge_multiplicity():
    """An edge with duplicate train instances is only masked when all of
    its instances are in the batch (collab semantics)."""
    # tiny handmade graph: edge (0,1) appears twice; (2,3) once
    train = np.array([[0, 1], [0, 1], [2, 3], [1, 2], [0, 4], [3, 4]])
    n = 5
    uniq, mult = masking.train_edge_info(train[:, 0], train[:, 1], n)
    from lpformer_tpu.data.dataset import build_graph_bundle
    sym_s = np.concatenate([train[:, 0], train[:, 1]])
    sym_d = np.concatenate([train[:, 1], train[:, 0]])
    ppr_csr = ppr_mod.ppr_push_csr(sym_s, sym_d, n, 0.15, 1e-3)
    g = build_graph_bundle(
        np.eye(n, 4, dtype=np.float32), train[:, 0], train[:, 1], None, n,
        ppr_csr, mask_uniq_keys=uniq,
    )
    mult_dev = jnp.asarray(mult)

    # batch contains ONE instance of (0,1): not masked
    mr = masking.batch_mask_ranks(
        g.adj_rows, jnp.asarray([0]), jnp.asarray([1]), mult_dev
    )
    hit = masking.rank_is_masked(mr, g.adj_rows.ranks[0])
    nbr0 = np.asarray(g.adj_rows.nbrs[0])
    is1 = nbr0 == 1
    assert not bool(np.asarray(hit)[is1].any()), "single instance masked!"

    # batch contains BOTH instances: masked
    mr2 = masking.batch_mask_ranks(
        g.adj_rows, jnp.asarray([0, 0]), jnp.asarray([1, 1]), mult_dev
    )
    hit2 = masking.rank_is_masked(mr2, g.adj_rows.ranks[0])
    assert bool(np.asarray(hit2)[is1].all()), "both instances not masked!"

    # (2,3) single instance: masked immediately
    mr3 = masking.batch_mask_ranks(
        g.adj_rows, jnp.asarray([2]), jnp.asarray([3]), mult_dev
    )
    hit3 = masking.rank_is_masked(mr3, g.adj_rows.ranks[2])
    nbr2 = np.asarray(g.adj_rows.nbrs[2])
    assert bool(np.asarray(hit3)[nbr2 == 3].all())


def test_budget_truncation_and_overflow():
    ds = _dataset()
    cfg = ContextConfig.from_thresholds(
        0.0, 1e-4, 1e-4, budget_cn=2, budget_onehop=3, budget_non1hop=2
    )
    src = jnp.asarray(ds.valid_pos[:10, 0])
    tgt = jnp.asarray(ds.valid_pos[:10, 1])
    ctx = extract_context(ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, cfg)
    # valid entries never exceed budgets per class
    cls = np.asarray(ctx.cls)
    valid = np.asarray(ctx.valid)
    assert ((cls == 2) & valid).sum(1).max() <= 2
    assert ((cls == 1) & valid).sum(1).max() <= 3
    assert ((cls == 3) & valid).sum(1).max() <= 2
    # counts stay exact (pre-truncation) and >= kept entries
    counts = np.asarray(ctx.counts)
    kept = valid.sum(1)
    assert (counts[:, 0] + counts[:, 1] + counts[:, 2] >= kept).all()
    over = np.asarray(ctx.overflow)
    total = counts[:, 0] + counts[:, 1] + counts[:, 2]
    assert (over == total - kept).all()


def test_budget_overflow_keeps_top_by_ppr():
    """Under budget pressure the kept entries must be the top-k by
    ppr_s + ppr_t per class (ties -> ascending node id), mirroring
    PaddedRows.from_csr's top-by-weight cap policy."""
    ds = _dataset()
    big = ContextConfig.from_thresholds(
        0.0, 1e-4, 1e-4, budget_cn=80, budget_onehop=160, budget_non1hop=80
    )
    small = ContextConfig.from_thresholds(
        0.0, 1e-4, 1e-4, budget_cn=2, budget_onehop=3, budget_non1hop=2
    )
    src = jnp.asarray(ds.valid_pos[:10, 0])
    tgt = jnp.asarray(ds.valid_pos[:10, 1])
    full = extract_context(ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, big)
    cut = extract_context(ds.graph.adj_rows, ds.graph.ppr_rows, src, tgt, small)
    got_full = _tables_to_sets(full)
    got_cut = _tables_to_sets(cut)
    budgets = {"cn": 2, "1hop": 3, "non1hop": 2}
    for b in range(10):
        for cls_name, budget in budgets.items():
            entries = got_full[b][cls_name]
            # expected: top-`budget` by ps+pt, ties toward smaller id
            want = sorted(
                entries.items(), key=lambda kv: (-(kv[1][0] + kv[1][1]), kv[0])
            )[:budget]
            want_ids = {v for v, _ in want}
            assert set(got_cut[b][cls_name].keys()) == want_ids, (
                f"link {b} class {cls_name}: kept set is not top-by-PPR"
            )
