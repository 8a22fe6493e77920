"""Regression tests for review findings: pad-weight masking and
int-exact lookup lanes beyond 2^24."""
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.data.synthetic import synthetic_dataset
from lpformer_tpu.ops import masking
from lpformer_tpu.ops.search import row_lookup, row_member_values


def test_padded_batch_rows_not_counted():
    ds = synthetic_dataset(
        seed=0, num_nodes=80, num_train=260, num_eval=20, feat_dim=8
    )
    e0 = ds.train_pos[0]
    # batch: one real instance of edge 7 plus many "pad" copies of edge 0
    pad_n = 12
    src = jnp.asarray(
        np.concatenate([[ds.train_pos[7, 0]], [e0[0]] * pad_n])
    )
    tgt = jnp.asarray(
        np.concatenate([[ds.train_pos[7, 1]], [e0[1]] * pad_n])
    )
    w = jnp.asarray(np.concatenate([[1.0], [0.0] * pad_n]).astype(np.float32))

    bm_w = masking.batch_mask_ranks(
        ds.graph.adj_rows, src, tgt, ds.mask_mult_device, weight=w
    )
    bm_no = masking.batch_mask_ranks(
        ds.graph.adj_rows, src, tgt, ds.mask_mult_device
    )
    # edge 0's rank
    uniq, _ = masking.train_edge_info(
        ds.train_pos[:, 0], ds.train_pos[:, 1], ds.num_nodes
    )
    r0 = masking.edge_ranks_for_entries(
        np.asarray([e0[0]]), np.asarray([e0[1]]), uniq, ds.num_nodes
    )[0]
    assert bool(bm_no[r0]), "unweighted counting should mask the pad edge"
    assert not bool(bm_w[r0]), "weighted counting must ignore pad rows"
    # the real batch edge is masked in both
    r7 = masking.edge_ranks_for_entries(
        np.asarray([ds.train_pos[7, 0]]), np.asarray([ds.train_pos[7, 1]]),
        uniq, ds.num_nodes,
    )[0]
    assert bool(bm_w[r7]) and bool(bm_no[r7])


def test_int_lookup_exact_beyond_2pow24():
    """Edge ranks on citation2 exceed 2^24; the f32 matmul lanes must not
    round them (15-bit split)."""
    rng = np.random.default_rng(0)
    b, k = 4, 16
    rows = np.sort(rng.choice(10**6, (b, k), replace=False), axis=1).astype(np.int32)
    big = np.int32(2**24 + 1)  # not representable in f32
    vals = rng.integers(2**24, 2**28, (b, k)).astype(np.int32)
    vals[0, 0] = big
    queries = rows[:, :4].copy()
    found, got = row_lookup(
        jnp.asarray(rows), jnp.asarray(vals), jnp.asarray(queries),
        jnp.int32(-1),
    )
    assert bool(found.all())
    np.testing.assert_array_equal(np.asarray(got), vals[:, :4])


def test_negative_default_rank_roundtrip():
    rows = jnp.asarray([[2, 5, 9, 2**30]], dtype=jnp.int32)
    vals = jnp.asarray([[-1, 7, 2**25, -1]], dtype=jnp.int32)
    q = jnp.asarray([[5, 9, 4]], dtype=jnp.int32)
    found, (got,) = row_member_values(rows, q, (vals,), (jnp.int32(-2),))
    assert np.asarray(found).tolist() == [[True, True, False]]
    assert np.asarray(got).tolist() == [[7, 2**25, -2]]


def test_rank_is_masked_row_gather_parity():
    """The [U/128, 128] row-gather + lane-select formulation must agree
    with the direct element gather for every lane/row edge case."""
    from lpformer_tpu.ops import masking

    rng = np.random.default_rng(9)
    for u in [1, 5, 127, 128, 129, 4096, 10001]:
        bm = jnp.asarray(rng.integers(0, 2, u).astype(bool))
        ranks = jnp.asarray(rng.integers(-1, u, (33, 17)).astype(np.int32))
        ref = np.asarray(bm)[np.clip(np.asarray(ranks), 0, u - 1)] & (
            np.asarray(ranks) >= 0)
        np.testing.assert_array_equal(
            np.asarray(masking.rank_is_masked(bm, ranks)), ref)
    assert not np.asarray(masking.rank_is_masked(
        jnp.zeros((0,), bool), jnp.asarray([[-1, 0]], np.int32))).any()


def test_bitmap_dot_path_matches_bincount():
    """bitmap_from_link_ranks must count exactly like np.bincount —
    duplicates, invalid ranks (-1/-2), zero weights, multiplicities
    > 1, U not a multiple of 128. (Pins the semantics any alternative
    formulation must preserve: an MXU one-hot block/lane dot was
    measured SLOWER than the scatter on v5e r4 — bitmap_only 2.17 ->
    2.49 ms, scripts/extraction_bench.py — and rejected.)"""
    rng = np.random.default_rng(3)
    u = 1000  # 7.8125 blocks -> exercises the tail slice
    b = 512
    rank = rng.integers(-2, u, size=b).astype(np.int32)
    rank[::7] = rank[3]  # force duplicates
    weight = (rng.random(b) > 0.2).astype(np.float32)
    mult = rng.integers(1, 3, size=u).astype(np.int32)

    got = np.asarray(
        masking.bitmap_from_link_ranks(
            jnp.asarray(rank), jnp.asarray(mult), jnp.asarray(weight)
        )
    )
    counted = rank[(rank >= 0) & (weight > 0)]
    want = np.bincount(counted, minlength=u) >= mult
    np.testing.assert_array_equal(got, want)
