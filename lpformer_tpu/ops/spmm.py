"""Sparse matrix-dense matrix products (SpMM) for GCN propagation.

TPU-native replacement for torch_sparse's CSR SpMM used inside PyG's
``GCNConv`` (reference: src/models/other_models.py:35-48,66). The graph is
a static COO edge list sorted by destination; aggregation is a gather +
``segment_sum`` which XLA lowers to a sorted scatter-add. Self loops are
never materialized: the diagonal of the normalized adjacency is applied as
an elementwise term, which both saves N edges and keeps the MXU matmuls
(feature transforms) dense.

GCN normalization D^{-1/2} (A + I) D^{-1/2} can be precomputed on host
(:func:`lpformer_tpu.graph.preprocess.gcn_norm_edges`) for static
adjacencies, or recomputed in-jit (:func:`gcn_norm_device`) when the
adjacency is masked per batch (``--mask-input``,
reference: src/train/train_model.py:47-57).
"""
from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def gcn_norm_device(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_w: jnp.ndarray,
    num_nodes: int,
    fill_value: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """In-jit GCN normalization.

    Returns (w_norm [E], diag [N]) where ``diag`` is the normalized
    self-loop coefficient fill / (deg + fill) applied elementwise.
    Matches PyG gcn_norm: deg = rowsum(A) + fill.
    """
    deg = jax.ops.segment_sum(
        edge_w, edge_dst, num_segments=num_nodes, indices_are_sorted=True
    )
    deg = deg + fill_value
    dinv = jnp.where(deg > 0, jax.lax.rsqrt(deg), 0.0)
    w_norm = dinv[edge_src] * edge_w * dinv[edge_dst]
    diag = dinv * fill_value * dinv
    return w_norm, diag


def _spmm_raw(edge_src, edge_dst, edge_w, x, num_nodes, diag, gather_dtype):
    src_vals = x if gather_dtype is None else x.astype(gather_dtype)
    gathered = src_vals[edge_src].astype(x.dtype) * edge_w[:, None]
    out = jax.ops.segment_sum(
        gathered, edge_dst, num_segments=num_nodes, indices_are_sorted=True
    )
    if diag is not None:
        out = out + diag[:, None] * x
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4, 6))
def _spmm_symmetric(edge_src, edge_dst, edge_w, x, num_nodes, diag,
                    gather_dtype):
    return _spmm_raw(edge_src, edge_dst, edge_w, x, num_nodes, diag,
                     gather_dtype)


def _spmm_sym_fwd(edge_src, edge_dst, edge_w, x, num_nodes, diag,
                  gather_dtype):
    out = _spmm_raw(edge_src, edge_dst, edge_w, x, num_nodes, diag,
                    gather_dtype)
    return out, (edge_src, edge_dst, edge_w, diag)


def _spmm_sym_bwd(num_nodes, gather_dtype, res, ct):
    """For symmetric (A = A^T) normalized adjacency, d/dx (A_hat x) =
    A_hat ct — reuse the dst-sorted fast scatter instead of letting XLA
    transpose the gather into an unsorted scatter."""
    edge_src, edge_dst, edge_w, diag = res
    dx = _spmm_raw(edge_src, edge_dst, edge_w, ct, num_nodes, diag,
                   gather_dtype)
    import numpy as _np

    f0 = lambda a: _np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    return f0(edge_src), f0(edge_dst), jnp.zeros_like(edge_w), dx, (
        None if diag is None else jnp.zeros_like(diag)
    )


_spmm_symmetric.defvjp(_spmm_sym_fwd, _spmm_sym_bwd)


def spmm(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_w: jnp.ndarray,
    x: jnp.ndarray,
    num_nodes: int,
    diag: Optional[jnp.ndarray] = None,
    symmetric: bool = True,
    gather_dtype=None,
) -> jnp.ndarray:
    """out[v] = sum_{(u,v) in E} w_uv * x[u]  (+ diag[v] * x[v]).

    ``edge_dst`` must be sorted ascending (preprocessing guarantees it),
    letting XLA use the fast sorted-scatter path. With ``symmetric=True``
    (all adjacencies in this framework are symmetrized) the backward pass
    reuses the same kernel via A = A^T. ``gather_dtype=bfloat16`` halves
    the random-read HBM traffic of the neighbor gather (accumulation
    stays f32).
    """
    if symmetric:
        return _spmm_symmetric(
            edge_src, edge_dst, edge_w, x, num_nodes, diag, gather_dtype
        )
    return _spmm_raw(
        edge_src, edge_dst, edge_w, x, num_nodes, diag, gather_dtype
    )


# --------------------------------------------------------------------------
# hybrid ELL + overflow-COO SpMM (scatter-free main path)
# --------------------------------------------------------------------------

def _spmm_ell_raw(ell, w_norm, x, diag, gather_dtype):
    """out[v] = sum_k w_slots[v,k] * x[nb[v,k]]  (+ overflow + diag term).

    The dense [N, cap] slot grid turns the dst-side reduction into an
    einsum over the slot axis — no scatter. Slots are swept in chunks of
    ``kc`` via ``lax.scan`` so the gathered transient stays bounded
    (~256MB) at any N/D. Measured 2.5x over gather+segment_sum on v5e
    (the reference's torch_sparse SpMM analog,
    reference: src/models/other_models.py:35-48,66).
    """
    n, cap = ell.nb.shape
    d = x.shape[-1]
    bytes_per = jnp.dtype(gather_dtype or x.dtype).itemsize
    kc = int(max(1, min(8, 256e6 // max(n * d * bytes_per, 1))))
    if w_norm is None:
        # static precomputed slot weights (ELLAdjacency.with_weights)
        w_slots, ov_w = ell.w_slots, ell.ov_w
    else:
        w_ext = jnp.concatenate([w_norm, jnp.zeros((1,), w_norm.dtype)])
        w_slots = w_ext[ell.slot_edge]                   # [N, cap]
        ov_w = w_ext[ell.ov_edge]
    xg = x if gather_dtype is None else x.astype(gather_dtype)

    pad = (-cap) % kc
    nb, ws = ell.nb, w_slots
    if pad:
        nb = jnp.concatenate([nb, jnp.zeros((n, pad), nb.dtype)], axis=1)
        ws = jnp.concatenate([ws, jnp.zeros((n, pad), ws.dtype)], axis=1)
    nsteps = (cap + pad) // kc
    nb_s = jnp.moveaxis(nb.reshape(n, nsteps, kc), 1, 0)
    ws_s = jnp.moveaxis(ws.reshape(n, nsteps, kc), 1, 0)

    acc0 = jnp.zeros_like(x) if diag is None else diag[:, None] * x

    def body(acc, xs):
        nb_c, w_c = xs
        g = xg[nb_c.reshape(-1)].reshape(n, kc, d).astype(x.dtype)
        # HIGHEST: TPU DEFAULT would truncate the f32 products to bf16,
        # breaking the documented f32 accumulation; the k<=8 contraction
        # is compute-trivial next to the row gather.
        return acc + jnp.einsum(
            "nk,nkd->nd", w_c, g, precision=jax.lax.Precision.HIGHEST
        ), None

    if nsteps == 1:
        out, _ = body(acc0, (nb_s[0], ws_s[0]))
    else:
        out, _ = jax.lax.scan(body, acc0, (nb_s, ws_s))

    if ell.ov_src.shape[0]:
        g = xg[ell.ov_src].astype(x.dtype) * ov_w[:, None]
        out = out + jax.ops.segment_sum(
            g, ell.ov_dst, num_segments=n, indices_are_sorted=True
        )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _spmm_ell_symmetric(ell, w_norm, x, diag, gather_dtype):
    return _spmm_ell_raw(ell, w_norm, x, diag, gather_dtype)


def _spmm_ell_fwd(ell, w_norm, x, diag, gather_dtype):
    out = _spmm_ell_raw(ell, w_norm, x, diag, gather_dtype)
    return out, (ell, w_norm, diag)


def _spmm_ell_bwd(gather_dtype, res, ct):
    """Symmetric A: d/dx (A_hat x) = A_hat ct — reuse the same
    scatter-free kernel on the cotangent."""
    ell, w_norm, diag = res
    dx = _spmm_ell_raw(ell, w_norm, ct, diag, gather_dtype)
    import numpy as _np

    f0 = lambda a: _np.zeros(a.shape, dtype=jax.dtypes.float0)  # noqa: E731
    import dataclasses as _dc

    ell_ct = _dc.replace(
        ell, nb=f0(ell.nb), slot_edge=f0(ell.slot_edge),
        ov_src=f0(ell.ov_src), ov_dst=f0(ell.ov_dst),
        ov_edge=f0(ell.ov_edge),
        w_slots=None if ell.w_slots is None else jnp.zeros_like(ell.w_slots),
        ov_w=None if ell.ov_w is None else jnp.zeros_like(ell.ov_w),
    )
    return ell_ct, (
        None if w_norm is None else jnp.zeros_like(w_norm)
    ), dx, (
        None if diag is None else jnp.zeros_like(diag)
    )


_spmm_ell_symmetric.defvjp(_spmm_ell_fwd, _spmm_ell_bwd)


def spmm_ell(
    ell,
    w_norm: jnp.ndarray,
    x: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    symmetric: bool = True,
    gather_dtype=None,
) -> jnp.ndarray:
    """Scatter-free SpMM over an :class:`~lpformer_tpu.graph.containers
    .ELLAdjacency` (same contract as :func:`spmm`; ``w_norm`` is indexed
    by the dst-sorted edge order the ELL was built from)."""
    if symmetric:
        return _spmm_ell_symmetric(ell, w_norm, x, diag, gather_dtype)
    return _spmm_ell_raw(ell, w_norm, x, diag, gather_dtype)


# --------------------------------------------------------------------------
# degree-bucketed ELL SpMM (no overflow, no scatter at all)
# --------------------------------------------------------------------------

def _tier_sweep(nb, ws, xg, out_dtype, kc):
    """sum_k ws[:, k] * x[nb[:, k]] for one [Nb, cap] tier, chunked over
    the slot axis so the gathered transient stays bounded."""
    n_t, cap = nb.shape
    d = xg.shape[-1]
    pad = (-cap) % kc
    if pad:
        nb = jnp.concatenate([nb, jnp.zeros((n_t, pad), nb.dtype)], axis=1)
        ws = jnp.concatenate([ws, jnp.zeros((n_t, pad), ws.dtype)], axis=1)
    nsteps = (cap + pad) // kc

    def body(acc, xs):
        nb_c, w_c = xs
        g = xg[nb_c.reshape(-1)].reshape(n_t, kc, d).astype(out_dtype)
        # HIGHEST: keep the f32 products exact (see _spmm_ell_raw)
        return acc + jnp.einsum(
            "nk,nkd->nd", w_c, g, precision=jax.lax.Precision.HIGHEST
        ), None

    if nsteps == 1:
        out, _ = body(jnp.zeros((n_t, d), out_dtype), (nb, ws))
    else:
        nb_s = jnp.moveaxis(nb.reshape(n_t, nsteps, kc), 1, 0)
        ws_s = jnp.moveaxis(ws.reshape(n_t, nsteps, kc), 1, 0)
        out, _ = jax.lax.scan(
            body, jnp.zeros((n_t, d), out_dtype), (nb_s, ws_s)
        )
    return out


def _spmm_bell_raw(bell, w_norm, x, diag, gather_dtype):
    """out[v] = sum_{(u,v) in E} w_uv * x[u]  (+ diag[v] * x[v]) over a
    :class:`~lpformer_tpu.graph.containers.BucketedELL`: per degree tier
    a dense gather+einsum, then one [N]-row gather to undo the tier
    permutation. No scatter-add in either direction (the symmetric
    backward runs the same sweeps on the cotangent)."""
    n, d = x.shape
    xg = x if gather_dtype is None else x.astype(gather_dtype)
    bytes_per = jnp.dtype(gather_dtype or x.dtype).itemsize
    w_ext = (
        None if w_norm is None
        else jnp.concatenate([w_norm, jnp.zeros((1,), w_norm.dtype)])
    )
    outs = []
    for i, cap in enumerate(bell.caps):
        nb = bell.nbs[i]
        ws = bell.w_slots[i] if w_norm is None else w_ext[bell.slot_edges[i]]
        kc = int(max(1, min(cap,
                            256e6 // max(nb.shape[0] * d * bytes_per, 1))))
        outs.append(_tier_sweep(nb, ws, xg, x.dtype, kc))
    cat = jnp.concatenate(outs + [jnp.zeros((1, d), x.dtype)], axis=0)
    out = cat[bell.outmap]
    if diag is not None:
        out = out + diag[:, None] * x
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _spmm_bell_symmetric(bell, w_norm, x, diag, gather_dtype):
    return _spmm_bell_raw(bell, w_norm, x, diag, gather_dtype)


def _spmm_bell_fwd(bell, w_norm, x, diag, gather_dtype):
    return _spmm_bell_raw(bell, w_norm, x, diag, gather_dtype), (
        bell, w_norm, diag
    )


def _spmm_bell_bwd(gather_dtype, res, ct):
    """Symmetric A: d/dx (A_hat x) = A_hat ct — the same scatter-free
    sweeps on the cotangent."""
    bell, w_norm, diag = res
    dx = _spmm_bell_raw(bell, w_norm, ct, diag, gather_dtype)
    import numpy as _np

    def z(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return _np.zeros(a.shape, dtype=jax.dtypes.float0)

    bell_ct = jax.tree_util.tree_map(z, bell)
    return bell_ct, (
        None if w_norm is None else jnp.zeros_like(w_norm)
    ), dx, (
        None if diag is None else jnp.zeros_like(diag)
    )


_spmm_bell_symmetric.defvjp(_spmm_bell_fwd, _spmm_bell_bwd)


def spmm_bell(
    bell,
    w_norm: Optional[jnp.ndarray],
    x: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    symmetric: bool = True,
    gather_dtype=None,
) -> jnp.ndarray:
    """Scatter-free SpMM over a degree-bucketed ELL (same contract as
    :func:`spmm`; ``w_norm=None`` uses the static prelaid slot weights)."""
    if symmetric:
        return _spmm_bell_symmetric(bell, w_norm, x, diag, gather_dtype)
    return _spmm_bell_raw(bell, w_norm, x, diag, gather_dtype)


# --------------------------------------------------------------------------
# (dst_block x src_block)-tiled bucketed-ELL SpMM: scatter-free AND
# slice-local — the big-graph production path
# --------------------------------------------------------------------------

def _bell_block(bell, xs, gather_dtype):
    """One BlockedBELL tile: f32 [rows_jj, d] partial aggregate over a
    source x-slice (the per-tier sweeps of :func:`_spmm_bell_raw`, f32
    accumulation, no diag)."""
    d = xs.shape[-1]
    xg = xs if gather_dtype is None else xs.astype(gather_dtype)
    bytes_per = jnp.dtype(gather_dtype or xs.dtype).itemsize
    outs = []
    for i, cap in enumerate(bell.caps):
        nb = bell.nbs[i]
        ws = bell.w_slots[i]
        kc = int(max(1, min(cap,
                            256e6 // max(nb.shape[0] * d * bytes_per, 1))))
        outs.append(_tier_sweep(nb, ws, xg, jnp.float32, kc))
    cat = jnp.concatenate(outs + [jnp.zeros((1, d), jnp.float32)], axis=0)
    return cat[bell.outmap]


def _spmm_bbell_raw(bb, x, diag, gather_dtype):
    """out[v] = sum w_uv * x[u] (+ diag term) over a
    :class:`~lpformer_tpu.graph.containers.BlockedBELL`.

    Composes the two measured wins: every slot gather addresses ONE
    <=16 MB x-slice (the gather engine's fast mode — BlockedCOO's
    insight) AND the per-tile aggregation is the scatter-free bucketed
    dense-slot einsum (BucketedELL's insight) with a [rows_jj]-row
    un-permute gather; dst-block accumulation is a plain add. The r5
    ppa-like profile showed BlockedCOO's per-tile sorted segment_sum
    running ~4x above the gather rate (85% of the step); BucketedELL
    alone pays the ~4-6x degraded full-table gather rate."""
    n, d = x.shape
    bs, kb = bb.block, bb.kb
    xg = x if gather_dtype is None else x.astype(gather_dtype)
    outs = []
    for jj in range(kb):
        rows_jj = min(bs, n - jj * bs)
        acc = jnp.zeros((rows_jj, d), jnp.float32)
        for ii in range(kb):
            bell = bb.tiles[jj * kb + ii]
            if bell is None:
                continue
            lo = ii * bs
            width = bs if lo + bs <= n else n - lo
            xs = jax.lax.dynamic_slice_in_dim(xg, lo, width, 0)
            # pin the slice as a materialized small operand so XLA can't
            # fuse it back into a full-table gather (see blocked path)
            xs = jax.lax.optimization_barrier(xs)
            acc = acc + _bell_block(bell, xs, None)
        outs.append(acc)
    out = jnp.concatenate(outs, axis=0).astype(x.dtype)
    if diag is not None:
        out = out + diag[:, None] * x
    return out


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _spmm_bbell_symmetric(bb, x, diag, gather_dtype):
    return _spmm_bbell_raw(bb, x, diag, gather_dtype)


def _spmm_bbell_fwd(bb, x, diag, gather_dtype):
    return _spmm_bbell_raw(bb, x, diag, gather_dtype), (bb, diag)


def _spmm_bbell_bwd(gather_dtype, res, ct):
    """Symmetric A: d/dx (A_hat x) = A_hat ct — the same tiled
    scatter-free sweeps on the cotangent."""
    bb, diag = res
    dx = _spmm_bbell_raw(bb, ct, diag, gather_dtype)
    import numpy as _np

    def z(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return _np.zeros(a.shape, dtype=jax.dtypes.float0)

    bb_ct = jax.tree_util.tree_map(z, bb)
    return bb_ct, dx, (None if diag is None else jnp.zeros_like(diag))


_spmm_bbell_symmetric.defvjp(_spmm_bbell_fwd, _spmm_bbell_bwd)


def spmm_bbell(
    bb,
    x: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    symmetric: bool = True,
    gather_dtype=None,
) -> jnp.ndarray:
    """Tiled scatter-free SpMM over a :class:`BlockedBELL` (static
    prelaid weights only — dynamic re-weighting uses BlockedCOO)."""
    if symmetric:
        return _spmm_bbell_symmetric(bb, x, diag, gather_dtype)
    return _spmm_bbell_raw(bb, x, diag, gather_dtype)


# --------------------------------------------------------------------------
# (dst_block x src_block)-tiled COO SpMM for LARGE node tables
# --------------------------------------------------------------------------

def _spmm_blocked_raw(blk, w_norm, x, diag, gather_dtype):
    """out[v] = sum w_uv * x[u] (+ diag term) over a
    :class:`~lpformer_tpu.graph.containers.BlockedCOO`.

    Every neighbor gather addresses ONE <=16 MB table slice: the gather
    engine's row rate from a [1M, 64] table is ~54 Mrows/s vs ~337 from
    a [131k, 64] slice (bench --gather on v5e), and these gathers
    dominate the citation2-like step. ``optimization_barrier`` pins each
    slice as a materialized small array so XLA cannot fuse the slice
    back into a full-table gather. Per-tile segment_sums are dst-sorted
    with a dummy pad row; accumulation is f32.
    """
    n, d = x.shape
    bs, kb = blk.block, blk.kb
    xg = x if gather_dtype is None else x.astype(gather_dtype)
    if w_norm is not None and blk.te is None:
        raise ValueError(
            "dynamic re-weighting (--mask-input) needs per-tile edge ids, "
            "but this BlockedCOO was built with with_edge_ids=False; "
            "rebuild the graph bundle with mask_input=True"
        )
    w_ext = (
        None if w_norm is None
        else jnp.concatenate([w_norm, jnp.zeros((1,), w_norm.dtype)])
    )
    outs = []
    for jj in range(kb):
        acc = jnp.zeros((bs + 1, d), jnp.float32)
        for ii in range(kb):
            t = jj * kb + ii
            sl, dl = blk.sl[t], blk.dl[t]
            tw = blk.tw[t] if w_norm is None else w_ext[blk.te[t]]
            lo = ii * bs
            width = bs if lo + bs <= n else n - lo
            xs = jax.lax.dynamic_slice_in_dim(xg, lo, width, 0)
            if width < bs:
                xs = jnp.concatenate(
                    [xs, jnp.zeros((bs - width, d), xs.dtype)], axis=0
                )
            xs = jax.lax.optimization_barrier(xs)
            g = xs[sl].astype(jnp.float32) * tw[:, None]
            acc = acc + jax.ops.segment_sum(
                g, dl, num_segments=bs + 1, indices_are_sorted=True
            )
        outs.append(acc[:bs])
    out = jnp.concatenate(outs, axis=0)[:n].astype(x.dtype)
    if diag is not None:
        out = out + diag[:, None] * x
    return out


@partial(jax.custom_vjp, nondiff_argnums=(4,))
def _spmm_blocked_symmetric(blk, w_norm, x, diag, gather_dtype):
    return _spmm_blocked_raw(blk, w_norm, x, diag, gather_dtype)


def _spmm_blocked_fwd(blk, w_norm, x, diag, gather_dtype):
    return _spmm_blocked_raw(blk, w_norm, x, diag, gather_dtype), (
        blk, w_norm, diag
    )


def _spmm_blocked_bwd(gather_dtype, res, ct):
    """Symmetric A: d/dx (A_hat x) = A_hat ct — the same tiled pass on
    the cotangent (no transpose layout needed)."""
    blk, w_norm, diag = res
    dx = _spmm_blocked_raw(blk, w_norm, ct, diag, gather_dtype)
    import numpy as _np

    def z(a):
        if jnp.issubdtype(a.dtype, jnp.floating):
            return jnp.zeros_like(a)
        return _np.zeros(a.shape, dtype=jax.dtypes.float0)

    blk_ct = jax.tree_util.tree_map(z, blk)
    return blk_ct, (
        None if w_norm is None else jnp.zeros_like(w_norm)
    ), dx, (
        None if diag is None else jnp.zeros_like(diag)
    )


_spmm_blocked_symmetric.defvjp(_spmm_blocked_fwd, _spmm_blocked_bwd)


def spmm_blocked(
    blk,
    w_norm: Optional[jnp.ndarray],
    x: jnp.ndarray,
    diag: Optional[jnp.ndarray] = None,
    symmetric: bool = True,
    gather_dtype=None,
) -> jnp.ndarray:
    """Tiled SpMM over a :class:`BlockedCOO` (same contract as
    :func:`spmm`; ``w_norm=None`` uses the static prelaid tile weights,
    otherwise weights re-gather through ``blk.te``)."""
    if symmetric:
        return _spmm_blocked_symmetric(blk, w_norm, x, diag, gather_dtype)
    return _spmm_blocked_raw(blk, w_norm, x, diag, gather_dtype)


def gcn_propagate(
    edge_src: jnp.ndarray,
    edge_dst: jnp.ndarray,
    edge_w: jnp.ndarray,
    x: jnp.ndarray,
    num_nodes: int,
    precomputed_norm: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
) -> jnp.ndarray:
    """One GCN aggregation A_hat @ x with normalization."""
    if precomputed_norm is not None:
        w_norm, diag = precomputed_norm
    else:
        w_norm, diag = gcn_norm_device(edge_src, edge_dst, edge_w, num_nodes)
    return spmm(edge_src, edge_dst, w_norm, x, num_nodes, diag=diag)
