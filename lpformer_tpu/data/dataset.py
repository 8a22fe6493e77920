"""Dataset container + device bundle assembly.

``LinkPredDataset`` plays the role of the reference's universal ``data``
dict (reference: src/util/read_datasets.py:24-26): splits as host arrays,
plus one :class:`GraphBundle` per adjacency variant (train graph, and the
"full" graph including validation edges for ``--use-val-in-test``,
reference: read_datasets.py:97-129).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph.containers import (
    BucketedELL,
    CSRGraph,
    ELLAdjacency,
    GraphBundle,
    PaddedRows,
)
from lpformer_tpu.graph import preprocess as pp
from lpformer_tpu.ops import masking


def _csr_entry_keys(csr: CSRGraph) -> np.ndarray:
    deg = csr.indptr[1:] - csr.indptr[:-1]
    rows = np.repeat(np.arange(csr.num_nodes, dtype=np.int64), deg)
    return rows * csr.num_nodes + csr.indices.astype(np.int64)


def _cross_lookup(
    adj_csr: CSRGraph, ppr_csr: CSRGraph
) -> tuple:
    """Host precompute of the pair-independent lookups:
      * per adjacency entry (u, v): ppr(u, v)   (0.0 if absent)
      * per PPR entry (u, v): v in N(u)
    These remove three of the per-batch compare-all reductions from the
    device context extraction (the self-side values never depend on the
    link partner)."""
    adj_keys = _csr_entry_keys(adj_csr)
    ppr_keys = _csr_entry_keys(ppr_csr)
    pos = np.searchsorted(ppr_keys, adj_keys)
    pos_c = np.clip(pos, 0, max(len(ppr_keys) - 1, 0))
    found = ppr_keys[pos_c] == adj_keys if len(ppr_keys) else np.zeros_like(adj_keys, bool)
    adj_selfppr = np.where(found, ppr_csr.weights[pos_c], 0.0).astype(np.float32)
    pos2 = np.searchsorted(adj_keys, ppr_keys)
    pos2_c = np.clip(pos2, 0, max(len(adj_keys) - 1, 0))
    ppr_in_adj = (
        adj_keys[pos2_c] == ppr_keys if len(adj_keys) else np.zeros_like(ppr_keys, bool)
    )
    return adj_selfppr, ppr_in_adj


def build_graph_bundle(
    x: np.ndarray,
    edge_src: np.ndarray,
    edge_dst: np.ndarray,
    edge_w: Optional[np.ndarray],
    num_nodes: int,
    ppr_csr: CSRGraph,
    adj_cap: Optional[int] = None,
    ppr_cap: Optional[int] = None,
    symmetrize: bool = True,
    mask_uniq_keys: Optional[np.ndarray] = None,
    build_ell: Optional[bool] = None,
    build_blocked: Optional[bool] = None,
    mask_input: bool = False,
) -> GraphBundle:
    """Assemble the static device-side graph state.

    ``edge_src/dst/w`` is the raw (possibly directed, possibly weighted)
    edge_index; we build:
      * the weighted symmetric adjacency for propagation (reference adj_t,
        read_datasets.py:85-92),
      * the binarized padded rows for context extraction (adj_mask, :95),
      * padded PPR rows from ``ppr_csr``.
    """
    if symmetrize:
        s, d, w = pp.symmetrize(edge_src, edge_dst, edge_w, num_nodes)
    else:
        s, d, w = pp.coalesce_edges(edge_src, edge_dst, edge_w, num_nodes)
    # propagation layout: sorted by destination for sorted segment_sum
    ps_, pd_, pw_ = pp.sort_by_dst(
        s.astype(np.int32), d.astype(np.int32), w, num_nodes
    )
    adj_csr = pp.edges_to_csr(s, d, w, num_nodes, coalesce=False)
    entry_ranks = (
        masking.edge_ranks_for_csr(adj_csr, mask_uniq_keys)
        if mask_uniq_keys is not None
        else None
    )
    adj_selfppr, ppr_in_adj = _cross_lookup(adj_csr, ppr_csr)
    adj_bin = pp.binarize_csr(adj_csr)
    # adjacency row values = self-PPR ppr(u, v): exact host lookup that
    # the device context extraction reuses; on cap overflow the rows keep
    # the highest-self-PPR neighbors
    adj_bin = CSRGraph(
        indptr=adj_bin.indptr, indices=adj_bin.indices,
        weights=adj_selfppr, num_nodes=num_nodes,
    )
    adj_rows = PaddedRows.from_csr(
        adj_bin,
        cap=adj_cap,
        with_vals=True,
        entry_ranks=entry_ranks,
    )
    ppr_rows = PaddedRows.from_csr(
        ppr_csr, cap=ppr_cap, with_vals=True, entry_flags=ppr_in_adj
    )
    deg = pp.out_degrees(np.asarray(edge_src, np.int64), num_nodes)
    prop_ranks = (
        masking.edge_ranks_for_entries(ps_, pd_, mask_uniq_keys, num_nodes)
        if mask_uniq_keys is not None
        else None
    )
    # static GCN norm (matches ops.spmm.gcn_norm_device exactly): the
    # in-jit recompute costs ~23 ms/step on v5e and is loop-invariant
    # whenever the propagation weights aren't batch-masked
    deg_w = np.zeros(num_nodes, np.float64)
    np.add.at(deg_w, pd_, pw_)
    deg_w += 1.0
    dinv = 1.0 / np.sqrt(deg_w)
    w_norm = (dinv[ps_] * pw_ * dinv[pd_]).astype(np.float32)
    w_diag = (dinv * dinv).astype(np.float32)
    # (dst_block x src_block)-tiled layout: auto-on for big node tables,
    # where the gather row rate from the full [N, dim] table degrades
    # ~6x (bench --gather; those gathers dominate the citation2-like
    # step). The model prefers blk > ell > COO; ELL defaults off when
    # blk is built (dead weight in HBM otherwise).
    if build_blocked is None:
        build_blocked = num_nodes >= 262_144
    from lpformer_tpu.graph.containers import BlockedBELL, BlockedCOO

    # Big-graph layouts: the scatter-free slice-local BlockedBELL is the
    # production path; it carries STATIC prelaid weights only, so the
    # --mask-input variant (per-batch masked renormalization) keeps the
    # dynamically re-weightable BlockedCOO instead (its te edge ids
    # exist only in that case — ~E x 4 bytes of HBM).
    bbell = None
    blk = None
    if build_blocked:
        if mask_input:
            blk = BlockedCOO.from_coo(
                ps_, pd_, num_nodes, w_norm=w_norm, with_edge_ids=True
            )
        else:
            bbell = BlockedBELL.from_coo(ps_, pd_, num_nodes, w_norm=w_norm)
    if build_ell is None:
        build_ell = blk is None and bbell is None
    # degree-bucketed ELL: scatter-free SpMM with ~zero slot waste and no
    # overflow path (host build keeps everything numpy until the end)
    ell = (
        BucketedELL.from_sorted_coo(ps_, pd_, num_nodes, w_norm=w_norm)
        if build_ell
        else None
    )
    return GraphBundle(
        blk=blk,
        bbell=bbell,
        x=jnp.asarray(x, jnp.float32),
        edge_src=jnp.asarray(ps_, jnp.int32),
        edge_dst=jnp.asarray(pd_, jnp.int32),
        edge_w=jnp.asarray(pw_, jnp.float32),
        edge_rank=(
            jnp.asarray(prop_ranks, jnp.int32)
            if prop_ranks is not None
            else None
        ),
        adj_rows=adj_rows,
        ppr_rows=ppr_rows,
        degree=jnp.asarray(deg, jnp.float32),
        num_nodes=num_nodes,
        num_edges=int(len(ps_)),
        ell=ell,
        w_norm=jnp.asarray(w_norm),
        w_diag=jnp.asarray(w_diag),
    )


@dataclasses.dataclass
class LinkPredDataset:
    name: str
    num_nodes: int
    graph: GraphBundle               # train-time adjacency/PPR
    graph_test: GraphBundle          # eval adjacency/PPR (may be the same)
    train_pos: np.ndarray            # [M, 2]
    train_pos_val: np.ndarray        # [V, 2] random train subset, reference
                                     # read_datasets.py:70-71
    valid_pos: np.ndarray
    valid_neg: np.ndarray            # [Vn, 2] or [V, K, 2] (HeaRT)
    test_pos: np.ndarray
    test_neg: np.ndarray
    metric: str = "MRR"              # per-dataset metric, reference run.py:102-120
    heart: bool = False
    # masking precompute (reference train_model.py:38-45 semantics)
    mask_uniq_keys: Optional[np.ndarray] = None
    mask_mult: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.mask_uniq_keys is None:
            self.mask_uniq_keys, self.mask_mult = masking.train_edge_info(
                self.train_pos[:, 0], self.train_pos[:, 1], self.num_nodes
            )

    @property
    def mask_mult_device(self) -> jnp.ndarray:
        return jnp.asarray(self.mask_mult, jnp.int32)
