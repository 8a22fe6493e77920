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
