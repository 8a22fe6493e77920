"""Parity of the lookup variants.

Three interchangeable implementations of the one-hot membership/value
reduction must agree bit-for-bit (int ranks, f32 PPR bit patterns,
citation2-scale node ids):

  * the XLA HIGHEST dot / fused VPU reduce (production path)
  * the lane-trimmed value-only form (``row_lookup_value``,
    ``with_found=False``) used by the extraction hot path
  * the Pallas VMEM kernel (ops/pallas/lookup.py, opt-in via
    LPFORMER_FUSED_LOOKUP=1 — measured slower on v5e but kept as a
    hardware-dependent option), run here under the interpreter.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from lpformer_tpu.ops.search import (
    fused_row_member_values,
    row_lookup_value,
    row_member_values,
)


def _random_case(rng, b, k, q, n=3_000_000):
    # sorted unique rows with a tail of pads (id = n, val = 0)
    rows = np.full((b, k), n, np.int32)
    ivals = np.full((b, k), -1, np.int32)
    fvals = np.zeros((b, k), np.float32)
    queries = np.zeros((b, q), np.int32)
    for i in range(b):
        nv = rng.integers(1, k + 1)
        ids = np.sort(rng.choice(n, size=nv, replace=False)).astype(np.int32)
        rows[i, :nv] = ids
        ivals[i, :nv] = rng.integers(-1, 30_000_000, size=nv)
        fvals[i, :nv] = rng.random(nv).astype(np.float32) * 1e-3
        # half the queries hit, half miss
        hits = rng.choice(ids, size=q // 2)
        misses = rng.integers(0, n, size=q - q // 2)
        queries[i] = np.concatenate([hits, misses])
    return (jnp.asarray(rows), jnp.asarray(queries),
            jnp.asarray(ivals), jnp.asarray(fvals))


@pytest.mark.parametrize("b,k,q", [(4, 96, 96), (3, 130, 257), (8, 8, 8)])
def test_pallas_lookup_matches_xla(b, k, q):
    rows, queries, ivals, fvals = _random_case(
        np.random.default_rng(b * 1000 + k + q), b, k, q
    )
    f_ref, (iv_ref, fv_ref) = row_member_values(
        rows, queries, (ivals, fvals), (-7, 0.0)
    )
    f_pl, (iv_pl, fv_pl) = fused_row_member_values(
        rows, queries, (ivals, fvals), (-7, 0.0), interpret=True
    )
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_pl))
    np.testing.assert_array_equal(np.asarray(iv_ref), np.asarray(iv_pl))
    # bit-exact float round-trip on both paths
    np.testing.assert_array_equal(np.asarray(fv_ref), np.asarray(fv_pl))


def test_pallas_lookup_membership_only():
    rows, queries, _, _ = _random_case(np.random.default_rng(0), 5, 64, 40)
    f_ref, _ = row_member_values(rows, queries)
    f_pl, _ = fused_row_member_values(rows, queries, interpret=True)
    np.testing.assert_array_equal(np.asarray(f_ref), np.asarray(f_pl))


def test_row_lookup_value_matches_with_found():
    rows, queries, _, fvals = _random_case(
        np.random.default_rng(3), 6, 80, 120
    )
    found, (v_ref,) = row_member_values(rows, queries, (fvals,), (0.0,))
    v = row_lookup_value(rows, fvals, queries)
    np.testing.assert_array_equal(np.asarray(v_ref), np.asarray(v))
    # absent queries reduce to exactly 0.0 without a membership lane
    assert np.all(np.asarray(v)[~np.asarray(found)] == 0.0)
