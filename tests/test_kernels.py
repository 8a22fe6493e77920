"""Kernel-level tests: SpMM / GCN norm / segment softmax vs dense refs."""
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph import preprocess as pp
from lpformer_tpu.ops import spmm
from lpformer_tpu.ops.segment import masked_softmax, segment_softmax

from oracle import dense_adj, gcn_norm_dense


def _rand_graph(seed, n=50, m=200):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    ok = src != dst
    w = rng.random(ok.sum()).astype(np.float32) + 0.5
    return src[ok], dst[ok], w, n


def test_spmm_matches_dense():
    src, dst, w, n = _rand_graph(0)
    s, d, ww = pp.symmetrize(src, dst, w, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), ww, n)
    x = np.random.default_rng(1).standard_normal((n, 16)).astype(np.float32)

    A = dense_adj(s, d, ww, n)
    want = gcn_norm_dense(A) @ x

    got = spmm.gcn_propagate(
        jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2), jnp.asarray(x), n
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_spmm_no_selfloop_diag_separate():
    src, dst, w, n = _rand_graph(2)
    s, d, ww = pp.symmetrize(src, dst, w, n)
    x = np.random.default_rng(3).standard_normal((n, 8)).astype(np.float32)
    w_norm, diag = spmm.gcn_norm_device(
        jnp.asarray(s.astype(np.int32)), jnp.asarray(d.astype(np.int32)),
        jnp.asarray(ww), n,
    )
    # diag term equals the self-loop coefficient of the dense norm
    A = dense_adj(s, d, ww, n)
    Ah = gcn_norm_dense(A)
    np.testing.assert_allclose(np.asarray(diag), np.diag(Ah), rtol=1e-5)


def test_masked_softmax_rows():
    logits = jnp.asarray(
        [[1.0, 2.0, 3.0], [5.0, -1.0, 0.0], [1.0, 1.0, 1.0]]
    )
    valid = jnp.asarray([[True, True, False], [True, False, False],
                         [False, False, False]])
    a = np.asarray(masked_softmax(logits, valid, axis=1))
    np.testing.assert_allclose(a[0, :2], np.exp([1.0, 2.0]) / np.exp([1.0, 2.0]).sum(), rtol=1e-6)
    assert a[0, 2] == 0
    np.testing.assert_allclose(a[1], [1.0, 0.0, 0.0], atol=1e-7)
    # fully-invalid row -> exactly zero, no NaN
    np.testing.assert_array_equal(a[2], [0.0, 0.0, 0.0])


def test_segment_softmax_matches_masked():
    rng = np.random.default_rng(0)
    seg = np.sort(rng.integers(0, 6, 40))
    logits = rng.standard_normal(40).astype(np.float32)
    got = np.asarray(
        segment_softmax(jnp.asarray(logits), jnp.asarray(seg), 6)
    )
    for s in range(6):
        m = seg == s
        if m.sum() == 0:
            continue
        e = np.exp(logits[m] - logits[m].max())
        np.testing.assert_allclose(got[m], e / e.sum(), rtol=1e-5)


def test_gcn_norm_weighted_self_loops():
    """Weighted graphs (collab): norm must use edge weights + fill=1."""
    src = np.array([0, 1, 2, 0])
    dst = np.array([1, 0, 0, 2])
    w = np.array([2.0, 2.0, 3.0, 3.0], dtype=np.float32)
    n = 3
    A = dense_adj(src, dst, w, n)
    want = gcn_norm_dense(A)
    s2, d2, w2 = pp.sort_by_dst(src.astype(np.int32), dst.astype(np.int32), w, n)
    x = np.eye(n, dtype=np.float32)
    got = spmm.gcn_propagate(
        jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2), jnp.asarray(x), n
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


# ----------------------------------------------------------------------
# hybrid ELL + overflow-COO SpMM
# ----------------------------------------------------------------------

def _ell_graph(seed, n=150, m=700, hub_deg=120):
    """Random graph plus one hub so the ELL build has a COO overflow."""
    from lpformer_tpu.graph.containers import ELLAdjacency

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    src = np.concatenate([src, rng.integers(0, n, hub_deg)])
    dst = np.concatenate([dst, np.full(hub_deg, 7)])
    s, d, w = pp.symmetrize(src, dst, None, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), w, n)
    ell = ELLAdjacency.from_sorted_coo(s2, d2, n, max_cap=16)
    return s2, d2, w2, ell, n


def test_ell_builder_roundtrip():
    """Every edge lands in exactly one slot or the overflow remainder."""
    s2, d2, _, ell, n = _ell_graph(0)
    e = len(s2)
    seen = np.zeros(e, bool)
    nb = np.asarray(ell.nb)
    slot_edge = np.asarray(ell.slot_edge)
    main = slot_edge < e
    eidx = slot_edge[main]
    assert not seen[eidx].any()
    seen[eidx] = True
    np.testing.assert_array_equal(s2[eidx], nb[main])
    rows = np.broadcast_to(np.arange(n)[:, None], nb.shape)[main]
    np.testing.assert_array_equal(d2[eidx], rows)
    ov = np.asarray(ell.ov_edge)
    assert not seen[ov].any()
    seen[ov] = True
    assert seen.all()
    np.testing.assert_array_equal(s2[ov], np.asarray(ell.ov_src))
    np.testing.assert_array_equal(d2[ov], np.asarray(ell.ov_dst))
    # hub row must overflow given cap <= 16 < its degree
    assert (np.asarray(ell.ov_dst) == 7).sum() > 0


def test_ell_spmm_matches_coo():
    s2, d2, w2, ell, n = _ell_graph(1)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 24)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    ref = spmm.spmm(es, ed, w_norm, x, n, diag=diag)
    got = spmm.spmm_ell(ell, w_norm, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # no-diag + bf16 gather variant
    ref2 = spmm.spmm(es, ed, w_norm, x, n, gather_dtype=jnp.bfloat16)
    got2 = spmm.spmm_ell(ell, w_norm, x, gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_ell_spmm_grad_matches_coo():
    s2, d2, w2, ell, n = _ell_graph(3)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 12)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    t = jnp.asarray(
        np.random.default_rng(5).standard_normal((n, 12)), jnp.float32
    )
    g_ref = jax.grad(
        lambda v: (spmm.spmm(es, ed, w_norm, v, n, diag=diag) * t).sum()
    )(x)
    g_ell = jax.grad(
        lambda v: (spmm.spmm_ell(ell, w_norm, v, diag=diag) * t).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_ell_cost_model_degenerate():
    """Cap-0-optimal (single giant hub) graphs return None -> COO path."""
    from lpformer_tpu.graph.containers import ELLAdjacency

    n = 2000
    src = np.arange(1, n, dtype=np.int32)
    dst = np.zeros(n - 1, np.int32)
    s2, d2, _ = pp.sort_by_dst(src, dst, np.ones(n - 1, np.float32), n)
    assert ELLAdjacency.from_sorted_coo(s2, d2, n, max_cap=64) is None
    assert ELLAdjacency.from_sorted_coo(
        np.zeros(0, np.int32), np.zeros(0, np.int32), n
    ) is None


def test_gcn_apply_ell_matches_coo():
    """Model-level: gcn_apply with the ELL path == the COO path."""
    from lpformer_tpu.models import gcn

    s2, d2, w2, ell, n = _ell_graph(6)
    rng = jax.random.PRNGKey(0)
    params = gcn.gcn_init(rng, 16, 32, 32, num_layers=2)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    ref = gcn.gcn_apply(params, x, es, ed, ew, n, residual=True)
    got = gcn.gcn_apply(params, x, es, ed, ew, n, residual=True, ell=ell)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


# ----------------------------------------------------------------------
# degree-bucketed ELL SpMM (scatter-free, no overflow path)
# ----------------------------------------------------------------------

def _bell_graph(seed, n=170, m=800, hub_deg=140, w_norm=False):
    """Random graph + a hub + isolated nodes: exercises every tier shape,
    the exact-max-degree last tier, and outmap's zeros-row fallback."""
    from lpformer_tpu.graph.containers import BucketedELL

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n - 10, m)   # leave nodes n-10..n-1 isolated
    dst = rng.integers(0, n - 10, m)
    src = np.concatenate([src, rng.integers(0, n - 10, hub_deg)])
    dst = np.concatenate([dst, np.full(hub_deg, 7)])
    s, d, w = pp.symmetrize(src, dst, None, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), w, n)
    wn = None
    if w_norm:
        es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
        wn = np.asarray(spmm.gcn_norm_device(es, ed, ew, n)[0])
    bell = BucketedELL.from_sorted_coo(s2, d2, n, w_norm=wn)
    return s2, d2, w2, bell, n


def test_bell_builder_roundtrip():
    """Every edge lands in exactly one slot of exactly one tier; outmap
    places every row; tier caps bound the row degrees."""
    s2, d2, _, bell, n = _bell_graph(0)
    e = len(s2)
    seen = np.zeros(e, bool)
    total_rows = 0
    for nb, se, cap in zip(bell.nbs, bell.slot_edges, bell.caps):
        nb, se = np.asarray(nb), np.asarray(se)
        assert nb.shape == se.shape and nb.shape[1] == cap
        assert nb.shape[0] % 8 == 0
        main = se < e
        eidx = se[main]
        assert not seen[eidx].any()
        seen[eidx] = True
        np.testing.assert_array_equal(s2[eidx], nb[main])
        total_rows += nb.shape[0]
    assert seen.all()
    outmap = np.asarray(bell.outmap)
    deg = np.bincount(d2, minlength=n)
    assert (outmap[deg == 0] == total_rows).all()
    assert (outmap[deg > 0] < total_rows).all()
    # slot waste is bounded by the pow2 tiering (plus row padding)
    assert bell.slot_total <= 2 * e + 8 * len(bell.caps) * max(bell.caps)
    # hub row (deg ~2*140+) must live in the exact-max-degree last tier
    assert bell.caps[-1] == int(deg.max())


def test_bell_spmm_matches_coo():
    s2, d2, w2, bell, n = _bell_graph(1)
    x = jnp.asarray(
        np.random.default_rng(2).standard_normal((n, 24)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    ref = spmm.spmm(es, ed, w_norm, x, n, diag=diag)
    got = spmm.spmm_bell(bell, w_norm, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    ref2 = spmm.spmm(es, ed, w_norm, x, n, gather_dtype=jnp.bfloat16)
    got2 = spmm.spmm_bell(bell, w_norm, x, gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_bell_static_weights_match_dynamic():
    """Prelaid w_slots (host-precomputed norm) == in-jit normalized."""
    s2, d2, w2, bell_w, n = _bell_graph(6, w_norm=True)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    got_static = spmm.spmm_bell(bell_w, None, x, diag=diag)
    got_dyn = spmm.spmm_bell(bell_w, w_norm, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got_static), np.asarray(got_dyn),
                               rtol=1e-6, atol=1e-7)


def test_bell_spmm_grad_matches_coo():
    s2, d2, w2, bell, n = _bell_graph(3)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 12)), jnp.float32
    )
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    t = jnp.asarray(
        np.random.default_rng(5).standard_normal((n, 12)), jnp.float32
    )
    g_ref = jax.grad(
        lambda v: (spmm.spmm(es, ed, w_norm, v, n, diag=diag) * t).sum()
    )(x)
    g_bell = jax.grad(
        lambda v: (spmm.spmm_bell(bell, w_norm, v, diag=diag) * t).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_bell), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_bell_empty_graph():
    from lpformer_tpu.graph.containers import BucketedELL

    assert BucketedELL.from_sorted_coo(
        np.zeros(0, np.int32), np.zeros(0, np.int32), 10
    ) is None


def _blk_graph(seed, n=300, m=1500, block=64):
    from lpformer_tpu.graph.containers import BlockedCOO

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    s, d, w = pp.symmetrize(src, dst, None, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), w, n)
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    blk = BlockedCOO.from_coo(
        s2, d2, n, w_norm=np.asarray(w_norm), block=block, pad_to=16
    )
    return es, ed, jnp.asarray(w_norm), diag, blk, n


def test_blocked_spmm_matches_coo():
    """Tiled small-slice SpMM == the COO path: static weights, dynamic
    weights via blk.te, no-diag + bf16-gather variants, and a node count
    that does NOT divide the block (ragged last slice)."""
    es, ed, w_norm, diag, blk, n = _blk_graph(0, n=300, block=64)
    assert n % blk.block != 0 and blk.kb == 5
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, 24)), jnp.float32
    )
    ref = spmm.spmm(es, ed, w_norm, x, n, diag=diag)
    got_static = spmm.spmm_blocked(blk, None, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got_static), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    got_dyn = spmm.spmm_blocked(blk, w_norm, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got_dyn), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    ref2 = spmm.spmm(es, ed, w_norm, x, n, gather_dtype=jnp.bfloat16)
    got2 = spmm.spmm_blocked(blk, None, x, gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_blocked_spmm_grad_matches_coo():
    es, ed, w_norm, diag, blk, n = _blk_graph(3, n=257, block=64)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 12)), jnp.float32
    )
    t = jnp.asarray(
        np.random.default_rng(5).standard_normal((n, 12)), jnp.float32
    )
    g_ref = jax.grad(
        lambda v: (spmm.spmm(es, ed, w_norm, v, n, diag=diag) * t).sum()
    )(x)
    g_blk = jax.grad(
        lambda v: (spmm.spmm_blocked(blk, None, v, diag=diag) * t).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_blk), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_gcn_apply_blocked_matches_coo():
    """Model-level: gcn_apply prefers blk and matches the COO path, in
    both the static-norm and dynamic-weights (mask_input) regimes."""
    from lpformer_tpu.graph.containers import BlockedCOO
    from lpformer_tpu.models import gcn

    es, ed, w_norm, diag, blk, n = _blk_graph(6, n=200, block=64)
    params = gcn.gcn_init(jax.random.PRNGKey(0), 16, 32, 32, num_layers=2)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )
    ew = jnp.ones_like(w_norm)
    ref = gcn.gcn_apply(params, x, es, ed, ew, n,
                        norm=(w_norm, diag))
    got = gcn.gcn_apply(params, x, es, ed, ew, n,
                        norm=(w_norm, diag), blk=blk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # dynamic: no host norm -> weights re-gathered through blk.te
    ref_d = gcn.gcn_apply(params, x, es, ed, ew, n)
    got_d = gcn.gcn_apply(params, x, es, ed, ew, n, blk=blk)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-5)


def _bbell_graph(seed, n=300, m=1500, block=64):
    from lpformer_tpu.graph.containers import BlockedBELL

    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    s, d, w = pp.symmetrize(src, dst, None, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), w, n)
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    bb = BlockedBELL.from_coo(s2, d2, n, w_norm=np.asarray(w_norm),
                              block=block)
    return es, ed, jnp.asarray(w_norm), diag, bb, n


def test_bbell_spmm_matches_coo():
    """Scatter-free slice-local tiled SpMM == the COO path: with/without
    diag, bf16-gather variant, ragged last block, empty tiles."""
    es, ed, w_norm, diag, bb, n = _bbell_graph(0, n=300, block=64)
    assert n % bb.block != 0 and bb.kb == 5
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((n, 24)), jnp.float32
    )
    ref = spmm.spmm(es, ed, w_norm, x, n, diag=diag)
    got = spmm.spmm_bbell(bb, x, diag=diag)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    ref2 = spmm.spmm(es, ed, w_norm, x, n, gather_dtype=jnp.bfloat16)
    got2 = spmm.spmm_bbell(bb, x, gather_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2),
                               rtol=1e-5, atol=1e-6)


def test_bbell_spmm_grad_matches_coo():
    es, ed, w_norm, diag, bb, n = _bbell_graph(3, n=257, block=64)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((n, 12)), jnp.float32
    )
    t = jnp.asarray(
        np.random.default_rng(5).standard_normal((n, 12)), jnp.float32
    )
    g_ref = jax.grad(
        lambda v: (spmm.spmm(es, ed, w_norm, v, n, diag=diag) * t).sum()
    )(x)
    g_bb = jax.grad(
        lambda v: (spmm.spmm_bbell(bb, v, diag=diag) * t).sum()
    )(x)
    np.testing.assert_allclose(np.asarray(g_bb), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_gcn_apply_prefers_bbell_static_only():
    """gcn_apply takes the bbell path under a static norm, and falls
    through to the dynamically re-weightable layouts when the norm is
    recomputed in-jit (mask_input semantics)."""
    from lpformer_tpu.models import gcn

    es, ed, w_norm, diag, bb, n = _bbell_graph(6, n=200, block=64)
    params = gcn.gcn_init(jax.random.PRNGKey(0), 16, 32, 32, num_layers=2)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((n, 16)), jnp.float32
    )
    ew = jnp.ones_like(w_norm)
    ref = gcn.gcn_apply(params, x, es, ed, ew, n, norm=(w_norm, diag))
    got = gcn.gcn_apply(params, x, es, ed, ew, n, norm=(w_norm, diag),
                        bbell=bb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    # no static norm (dynamic weights): bbell must NOT be used — the
    # COO fallback recomputes the norm in-jit and stays exact
    ref_d = gcn.gcn_apply(params, x, es, ed, ew, n)
    got_d = gcn.gcn_apply(params, x, es, ed, ew, n, bbell=bb)
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-5)
