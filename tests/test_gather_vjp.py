"""Custom-VJP correctness: gather_rows and symmetric SpMM vs autodiff."""
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph import preprocess as pp
from lpformer_tpu.ops.gather import gather_rows
from lpformer_tpu.ops import spmm


def test_gather_rows_grad_matches_autodiff():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((40, 8)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, 40, (6, 10)).astype(np.int32))
    C = jnp.asarray(rng.standard_normal((6, 10, 8)).astype(np.float32))

    g_custom = jax.grad(lambda X: jnp.sum(gather_rows(X, ids) * C))(X)
    g_auto = jax.grad(lambda X: jnp.sum(X[ids] * C))(X)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=1e-5, atol=1e-6
    )


def test_spmm_symmetric_grad_matches_autodiff():
    rng = np.random.default_rng(1)
    n = 30
    src = rng.integers(0, n, 120)
    dst = rng.integers(0, n, 120)
    ok = src != dst
    s, d, w = pp.symmetrize(src[ok], dst[ok], None, n)
    s2, d2, w2 = pp.sort_by_dst(s.astype(np.int32), d.astype(np.int32), w, n)
    es, ed, ew = jnp.asarray(s2), jnp.asarray(d2), jnp.asarray(w2)
    w_norm, diag = spmm.gcn_norm_device(es, ed, ew, n)
    X = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))

    g_custom = jax.grad(
        lambda X: jnp.sum(
            spmm.spmm(es, ed, w_norm, X, n, diag=diag, symmetric=True) * C
        )
    )(X)
    g_auto = jax.grad(
        lambda X: jnp.sum(
            spmm.spmm(es, ed, w_norm, X, n, diag=diag, symmetric=False) * C
        )
    )(X)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_auto), rtol=1e-4, atol=1e-5
    )


# ----------------------------------------------------------------------
# Pallas sorted tile-partitioned scatter-add (gather backward on TPU)
# ----------------------------------------------------------------------

def _scatter_ref(ids, ct, n):
    return jax.ops.segment_sum(
        jnp.asarray(ct, jnp.float32).reshape(-1, ct.shape[-1]),
        jnp.asarray(ids).reshape(-1), num_segments=n)


def test_pallas_scatter_matches_segment_sum():
    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(0)
    for m, n, d in [(5000, 1200, 128), (700, 50, 128), (8192, 3000, 256),
                    (64, 2000, 128)]:
        ids = jnp.asarray(rng.integers(0, n, m).astype(np.int32))
        ct = jnp.asarray(rng.standard_normal((m, d)).astype(np.float32))
        got = scatter_rows_add(ids, ct, n, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_scatter_ref(ids, ct, n)),
            rtol=1e-4, atol=1e-4)


def test_pallas_scatter_skewed_and_bf16():
    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(1)
    # hub destination + many empty id tiles + sentinel padding
    ids = np.zeros(4000, np.int32)
    ids[:7] = 1499
    ct = rng.standard_normal((4000, 128)).astype(np.float32)
    got = scatter_rows_add(jnp.asarray(ids), jnp.asarray(ct), 1500,
                           interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_scatter_ref(ids, ct, 1500)),
        rtol=1e-4, atol=1e-3)
    ctb = jnp.asarray(ct, jnp.bfloat16)
    got_b = scatter_rows_add(jnp.asarray(ids), ctb, 1500, interpret=True)
    ref_b = _scatter_ref(ids, np.asarray(ctb, np.float32), 1500)
    np.testing.assert_allclose(np.asarray(got_b), np.asarray(ref_b),
                               rtol=1e-3, atol=1e-3)


def test_pallas_scatter_2d_ids_shape():
    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(2)
    ids = jnp.asarray(rng.integers(0, 300, (16, 40)).astype(np.int32))
    ct = jnp.asarray(rng.standard_normal((16, 40, 128)).astype(np.float32))
    got = scatter_rows_add(ids, ct, 300, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(_scatter_ref(ids, ct, 300)),
        rtol=1e-4, atol=1e-4)


def test_pallas_scatter_segmented_layout():
    """Multi-segment permutation locality (seg_rows < m): per-segment
    sorts + per-(tile, segment) chunk ranges must reproduce the global
    scatter exactly — incl. ragged last segment, empty tiles, hub ids
    crossing segment boundaries, and a tile whose rows appear in every
    segment."""
    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(3)
    m, n, d = 7000, 900, 128
    ids = rng.integers(0, n, m).astype(np.int32)
    ids[::11] = 5          # one hot id in every segment
    ids[m - 400:] = n - 1  # tail tile, concentrated in the last segment
    ct = rng.standard_normal((m, d)).astype(np.float32)
    for seg_rows in (1024, 2048, 4096):
        got = scatter_rows_add(
            jnp.asarray(ids), jnp.asarray(ct), n,
            tile=256, chunk=256, seg_rows=seg_rows, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(_scatter_ref(ids, ct, n)),
            rtol=1e-4, atol=1e-3)


def test_pallas_scatter_live_mask_drops_dead_rows():
    """live=False rows must not contribute — even when they carry
    NONZERO values and real ids (the production contract: invalid
    context slots have spread real ids but zero cotangents; the mask
    makes dropping robust to either)."""
    from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

    rng = np.random.default_rng(5)
    m, n = 6000, 700
    ids = rng.integers(0, n, m).astype(np.int32)
    ct = rng.standard_normal((m, 128)).astype(np.float32)
    live = rng.random(m) < 0.25
    got = scatter_rows_add(
        jnp.asarray(ids), jnp.asarray(ct), n,
        tile=256, chunk=256, seg_rows=2048,
        live=jnp.asarray(live), interpret=True)
    ref = _scatter_ref(np.where(live, ids, 0),
                       ct * live[:, None].astype(np.float32), n)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-3)


def test_gather_rows_valid_grad_matches_masked_gather():
    """End-to-end: d/dtable of a validity-masked gather equals the
    dense masked reference, on the non-Pallas (CPU) path and via the
    same code the model calls."""
    from lpformer_tpu.ops.gather import gather_rows_valid

    rng = np.random.default_rng(6)
    n, d, b, c = 50, 128, 8, 12
    table = jnp.asarray(rng.standard_normal((n, d)).astype(np.float32))
    ids = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
    valid = jnp.asarray(rng.random((b, c)) < 0.4)
    t = jnp.asarray(rng.standard_normal((b, c, d)).astype(np.float32))
    # cotangent is masked by valid downstream, as in the attention path
    g = jax.grad(
        lambda tb: (gather_rows_valid(tb, ids, valid)
                    * t * valid[..., None]).sum()
    )(table)
    g_ref = jax.grad(
        lambda tb: (tb[ids] * t * valid[..., None]).sum()
    )(table)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)
