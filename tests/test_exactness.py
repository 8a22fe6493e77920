"""Integer/value exactness of the one-hot dot_general lookups.

The compare-all membership lookup (ops/search.py) and the prefix-sum
one-hot compaction (ops/context.py) carry node ids, edge ranks, and PPR
values through f32 matmul lanes. On TPU, DEFAULT matmul precision
truncates f32 inputs to bf16 (8 mantissa bits) — which silently rounds
any id > 256 (measured on v5e: id 123456 -> 123392, stored int -1 ->
-32768) — so both dots pin ``precision=HIGHEST``. These tests use
citation2-scale ids; they pass trivially on CPU (f32 dots are exact
there) and guard the contract wherever a TPU backend runs the suite.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.ops.context import _compact
from lpformer_tpu.ops.search import row_member_values


def test_row_member_values_exact_large_ids():
    rows = jnp.asarray([[5, 70000, 123456, 1000003, 2900001]], jnp.int32)
    ivals = jnp.asarray([[-1, 70000, 123456, 1000003, 2900001]], jnp.int32)
    fvals = jnp.asarray(
        [[0.1234567, 3.14159e-4, 1.0, 2.5e-6, 0.999999]], jnp.float32
    )
    found, (iv, fv) = jax.jit(
        lambda r, q, v, f: row_member_values(r, q, (v, f), (-7, 0.0))
    )(rows, rows, ivals, fvals)
    assert bool(jnp.all(found))
    np.testing.assert_array_equal(np.asarray(iv), np.asarray(ivals))
    # float lanes must come back bit-exact, not bf16-rounded
    np.testing.assert_array_equal(np.asarray(fv), np.asarray(fvals))


def test_compact_exact_large_ids():
    ids = jnp.asarray([[123456, 1000003, 2900001, 70000, 33]], jnp.int32)
    ps = jnp.asarray([[0.5, 0.25, 0.125, 0.0625, 0.03125]], jnp.float32)
    valid = jnp.asarray([[True, True, True, True, False]])
    ids2, cls2, ps2, pt2, v2, dropped = jax.jit(
        lambda i, p, v: _compact(i, jnp.int32(2), p, p, v, 4, 3_000_000)
    )(ids, ps, valid)
    np.testing.assert_array_equal(
        np.asarray(ids2), [[123456, 1000003, 2900001, 70000]]
    )
    np.testing.assert_array_equal(
        np.asarray(ps2), np.asarray(ps[:, :4])
    )
    assert int(dropped[0]) == 0
