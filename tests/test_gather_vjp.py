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
