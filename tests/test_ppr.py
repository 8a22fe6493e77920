"""PPR push kernel vs exact dense solve, and native-vs-python parity."""
import os

import numpy as np
import pytest

from lpformer_tpu.graph import ppr as ppr_mod


def _ring_plus_chords(n=40, seed=0):
    rng = np.random.default_rng(seed)
    src = np.arange(n)
    dst = (src + 1) % n
    extra_s = rng.integers(0, n, n)
    extra_d = rng.integers(0, n, n)
    ok = extra_s != extra_d
    s = np.concatenate([src, dst, extra_s[ok], extra_d[ok]])
    d = np.concatenate([dst, src, extra_d[ok], extra_s[ok]])
    return s, d, n


def test_push_approximates_exact():
    s, d, n = _ring_plus_chords()
    alpha, eps = 0.15, 1e-5
    csr = ppr_mod.ppr_push_csr(s, d, n, alpha, eps)
    exact = ppr_mod.ppr_dense_oracle(s, d, n, alpha)
    # push guarantee: residual per node bounded, approximation from below
    approx = np.zeros((n, n))
    for i in range(n):
        lo, hi = csr.indptr[i], csr.indptr[i + 1]
        approx[i, csr.indices[lo:hi]] = csr.weights[lo:hi]
    # per-entry error bounded by eps * deg-ish; use generous tolerance
    assert np.all(approx <= exact + 1e-6), "push overshoots exact PPR"
    assert np.abs(approx - exact).max() < 50 * alpha * eps * n
    # high-quality: rows sum close to 1 for small eps
    assert approx.sum(1).min() > 0.95


def test_source_always_present():
    s, d, n = _ring_plus_chords(seed=2)
    csr = ppr_mod.ppr_push_csr(s, d, n, 0.15, 1e-2)
    for i in range(n):
        row = csr.indices[csr.indptr[i]:csr.indptr[i + 1]]
        assert i in row, f"source {i} missing from own PPR row"
        assert np.all(np.diff(row) > 0), "row not strictly sorted"


def test_native_matches_python():
    if ppr_mod._load_native() is None:
        pytest.skip("native kernel unavailable")
    s, d, n = _ring_plus_chords(seed=3)
    nat = ppr_mod.ppr_push_csr(s, d, n, 0.15, 1e-3)
    old_lib, old_tried = ppr_mod._LIB, ppr_mod._LIB_TRIED
    os.environ["LPFORMER_TPU_NO_NATIVE"] = "1"
    ppr_mod._LIB, ppr_mod._LIB_TRIED = None, False
    try:
        py = ppr_mod.ppr_push_csr(s, d, n, 0.15, 1e-3)
    finally:
        del os.environ["LPFORMER_TPU_NO_NATIVE"]
        ppr_mod._LIB, ppr_mod._LIB_TRIED = old_lib, old_tried
    np.testing.assert_array_equal(nat.indptr, py.indptr)
    np.testing.assert_array_equal(nat.indices, py.indices)
    np.testing.assert_allclose(nat.weights, py.weights, atol=1e-6)


def test_cache_roundtrip(tmp_path):
    s, d, n = _ring_plus_chords(seed=4)
    a = ppr_mod.get_ppr("testds", s, d, n, 0.15, 1e-2, cache_dir=str(tmp_path))
    b = ppr_mod.get_ppr("testds", s, d, n, 0.15, 1e-2, cache_dir=str(tmp_path))
    np.testing.assert_array_equal(a.indices, b.indices)
    np.testing.assert_allclose(a.weights, b.weights)
