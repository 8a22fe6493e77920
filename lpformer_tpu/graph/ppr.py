"""Personalized PageRank (PPR) precompute.

Offline preprocessing that produces the sparse PPR matrix driving context
node selection. Mirrors the reference pipeline
(reference: src/util/calc_ppr_scores.py:103-270): Andersen push per source
node with stopping criterion ``r[v] >= alpha * eps * deg(v)``, cached to
disk keyed by (dataset, alpha, eps, val-flag).

Three implementations, fastest available wins:
  1. native C++ multithreaded kernel (native/ppr_push.cpp, via ctypes) —
     the TPU-native framework's replacement for the reference's numba JIT;
  2. pure-numpy push (exact same semantics, slow — tests/small graphs);
  3. ``ppr_dense_oracle`` — exact closed-form solve for unit tests.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

from lpformer_tpu.graph.containers import CSRGraph
from lpformer_tpu.graph.preprocess import edges_to_csr

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB = None
_LIB_TRIED = False


def _load_native():
    """Load (building if needed) the native push kernel. None on failure."""
    global _LIB, _LIB_TRIED
    if _LIB is not None or _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    if os.environ.get("LPFORMER_TPU_NO_NATIVE"):
        return None
    so_path = os.path.join(_NATIVE_DIR, "libppr_push.so")
    try:
        if not os.path.exists(so_path):
            subprocess.run(
                ["make", "libppr_push.so"],
                cwd=_NATIVE_DIR,
                check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so_path)
        lib.ppr_push_run.restype = ctypes.c_int64
        lib.ppr_push_run.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_double,
            ctypes.c_double,
            ctypes.c_int64,
            ctypes.c_int32,
        ]
        lib.ppr_push_collect.restype = None
        lib.ppr_push_collect.argtypes = [
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
        ]
        _LIB = lib
    except Exception:
        _LIB = None
    return _LIB


def _push_numpy(
    indptr: np.ndarray,
    indices: np.ndarray,
    out_degree: np.ndarray,
    alpha: float,
    eps: float,
) -> Tuple[list, list]:
    """Pure-python push, bit-for-bit the reference algorithm
    (reference: src/util/calc_ppr_scores.py:160-192)."""
    alpha_eps = alpha * eps
    n = len(out_degree)
    js, vals = [], []
    for inode in range(n):
        p: dict = {inode: 0.0}
        r = {inode: alpha}
        q = [inode]
        while q:
            unode = q.pop()
            res = r.get(unode, 0.0)
            p[unode] = p.get(unode, 0.0) + res
            r[unode] = 0.0
            du = out_degree[unode]
            if du == 0:
                continue
            _val = (1 - alpha) * res / du
            for vnode in indices[indptr[unode]:indptr[unode + 1]]:
                vnode = int(vnode)
                r[vnode] = r.get(vnode, 0.0) + _val
                if r[vnode] >= alpha_eps * out_degree[vnode]:
                    if vnode not in q:
                        q.append(vnode)
        js.append(list(p.keys()))
        vals.append(list(p.values()))
    return js, vals


def ppr_push_csr(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_nodes: int,
    alpha: float = 0.15,
    eps: float = 1e-4,
    num_threads: int = 0,
) -> CSRGraph:
    """Approximate PPR matrix (rows = sources) as a CSR over all nodes."""
    adj = edges_to_csr(
        edge_src, edge_dst, None, num_nodes, coalesce=True, reduce="max"
    )
    indptr = np.ascontiguousarray(adj.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(adj.indices, dtype=np.int32)
    out_degree = np.ascontiguousarray(
        indptr[1:] - indptr[:-1], dtype=np.int64
    )

    lib = _load_native()
    if lib is not None:
        nnz = lib.ppr_push_run(
            indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_degree.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            float(alpha),
            float(eps),
            num_nodes,
            num_threads,
        )
        out_indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        out_indices = np.zeros(max(nnz, 1), dtype=np.int32)
        out_vals = np.zeros(max(nnz, 1), dtype=np.float32)
        lib.ppr_push_collect(
            out_indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            out_indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out_vals.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        out_indices, out_vals = out_indices[:nnz], out_vals[:nnz]
    else:
        js, vals = _push_numpy(
            indptr, indices, out_degree.astype(np.float64), alpha, eps
        )
        out_indptr = np.zeros(num_nodes + 1, dtype=np.int64)
        out_indptr[1:] = np.cumsum([len(j) for j in js])
        out_indices = np.concatenate(
            [np.asarray(j, dtype=np.int32) for j in js]
        )
        out_vals = np.concatenate(
            [np.asarray(v, dtype=np.float32) for v in vals]
        )

    # sort each row by node id (the padded-row layout wants sorted rows;
    # reference coalesces to the same order at calc_ppr_scores.py:239)
    row_src = np.repeat(
        np.arange(num_nodes, dtype=np.int64), out_indptr[1:] - out_indptr[:-1]
    )
    key = row_src * num_nodes + out_indices.astype(np.int64)
    order = np.argsort(key, kind="stable")
    out_indices, out_vals = out_indices[order], out_vals[order]
    return CSRGraph(
        indptr=out_indptr,
        indices=out_indices,
        weights=out_vals,
        num_nodes=num_nodes,
    )


def ppr_dense_oracle(
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_nodes: int,
    alpha: float = 0.15,
) -> np.ndarray:
    """Exact PPR: P[s] = alpha * (I - (1-alpha) A^T D^{-1})^{-1} e_s.

    The fixed point of the push recursion; rows of the returned [N, N]
    matrix upper-bound the push approximation (used as a test oracle).
    """
    A = np.zeros((num_nodes, num_nodes), dtype=np.float64)
    A[edge_src, edge_dst] = 1.0
    deg = A.sum(axis=1)
    dinv = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-30), 0.0)
    M = np.eye(num_nodes) - (1 - alpha) * (A.T * dinv[None, :])
    return alpha * np.linalg.inv(M).T  # row s = PPR vector of source s


def get_ppr(
    dataset: str,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    num_nodes: int,
    alpha: float = 0.15,
    eps: float = 1e-4,
    is_val: bool = False,
    cache_dir: Optional[str] = None,
) -> CSRGraph:
    """Load-or-compute with on-disk cache.

    Cache layout mirrors the reference
    (``node_subsets/ppr/{dataset}/sparse_adj-{alpha}_eps-{eps}[_val]``,
    reference: src/util/calc_ppr_scores.py:249-267) but stores npz.
    """
    if cache_dir is None:
        cache_dir = os.path.join("node_subsets", "ppr", dataset)
    os.makedirs(cache_dir, exist_ok=True)
    alpha_str = str(alpha).replace(".", "")
    eps_str = str(eps).replace(".", "")
    suffix = "_val" if is_val else ""
    path = os.path.join(
        cache_dir, f"sparse_adj-{alpha_str}_eps-{eps_str}{suffix}.npz"
    )
    if os.path.isfile(path):
        z = np.load(path)
        return CSRGraph(
            indptr=z["indptr"],
            indices=z["indices"],
            weights=z["weights"],
            num_nodes=int(z["num_nodes"]),
        )
    csr = ppr_push_csr(edge_src, edge_dst, num_nodes, alpha, eps)
    np.savez_compressed(
        path,
        indptr=csr.indptr,
        indices=csr.indices,
        weights=csr.weights,
        num_nodes=np.int64(num_nodes),
    )
    return csr
