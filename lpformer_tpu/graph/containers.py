"""Static graph containers.

The reference framework (LPFormer) keeps the graph as dynamic sparse-COO /
torch_sparse tensors and does per-batch sparse algebra on them
(reference: src/models/link_transformer.py:214-319,434-481). That is the
antithesis of XLA's static-shape compilation model. Here every graph
artifact is a *fixed-shape* array built once in preprocessing:

  * ``CSRGraph``    — host-side CSR (numpy), the preprocessing currency.
  * ``PaddedRows``  — device-side [N, K] padded row layout ("ELL" format):
                      per-row sorted neighbor ids (pad = N sentinel) plus
                      optional per-entry values. Sorted rows make membership
                      tests / value lookups O(log K) via vectorized binary
                      search, which is how the per-link context sets are
                      extracted on-device with static shapes.
  * ``GraphBundle`` — everything a model forward needs, as one pytree whose
                      leaves are device arrays and whose metadata (shapes,
                      caps) is static.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class CSRGraph:
    """Host-side CSR adjacency. Rows sorted by column id within each row."""

    indptr: np.ndarray   # [N+1] int64
    indices: np.ndarray  # [nnz] int32/int64, sorted within each row
    weights: np.ndarray  # [nnz] float32
    num_nodes: int

    @property
    def nnz(self) -> int:
        return int(self.indices.shape[0])

    def row(self, i: int) -> np.ndarray:
        return self.indices[self.indptr[i]:self.indptr[i + 1]]

    def row_weights(self, i: int) -> np.ndarray:
        return self.weights[self.indptr[i]:self.indptr[i + 1]]

    def degrees(self) -> np.ndarray:
        return (self.indptr[1:] - self.indptr[:-1]).astype(np.int32)

    def to_coo(self):
        """Return (src, dst, w) sorted by (src, dst)."""
        src = np.repeat(
            np.arange(self.num_nodes, dtype=np.int32), self.degrees()
        )
        return src, self.indices.astype(np.int32), self.weights


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nbrs", "vals", "counts", "ranks", "flags"],
    meta_fields=["cap", "num_nodes"],
)
@dataclasses.dataclass(frozen=True)
class PaddedRows:
    """[N, K] padded per-row neighbor lists, sorted ascending, pad = N.

    The pad sentinel equals ``num_nodes`` so that sorted order is preserved
    (all real ids < N) and binary searches never match padding.

    ``ranks`` is an optional int32 side array carrying each entry's
    undirected-train-edge rank (see :mod:`lpformer_tpu.ops.masking`);
    -1 at padding / non-train entries.
    """

    nbrs: jnp.ndarray             # [N, K] int32, sorted, pad = num_nodes
    vals: Optional[jnp.ndarray]   # [N, K] float32 or None (0.0 at padding)
    counts: jnp.ndarray           # [N] int32 actual row lengths (<= K)
    ranks: Optional[jnp.ndarray]  # [N, K] int32 or None (-1 at padding)
    flags: Optional[jnp.ndarray]  # [N, K] bool or None (False at padding)
    cap: int
    num_nodes: int

    @staticmethod
    def from_csr(
        csr: CSRGraph,
        cap: Optional[int] = None,
        with_vals: bool = True,
        entry_ranks: Optional[np.ndarray] = None,
        entry_flags: Optional[np.ndarray] = None,
    ) -> "PaddedRows":
        """Build padded rows from CSR. Rows longer than ``cap`` keep the
        ``cap`` entries with the largest weights (ties → smaller node id),
        mirroring "keep the most important context nodes" if a cap ever
        truncates; overflow is reported by ``overflow_rows``.

        ``entry_ranks``: optional int32 array aligned with the CSR entry
        order, carried through selection/sorting into the padded layout.
        """
        n = csr.num_nodes
        deg = csr.indptr[1:] - csr.indptr[:-1]
        max_deg = int(deg.max()) if n > 0 and len(deg) else 0
        k = max_deg if cap is None else int(cap)
        k = max(k, 1)
        nbrs = np.full((n, k), n, dtype=np.int32)
        vals = np.zeros((n, k), dtype=np.float32)
        rks = (
            np.full((n, k), -1, dtype=np.int32)
            if entry_ranks is not None
            else None
        )
        flg = (
            np.zeros((n, k), dtype=bool)
            if entry_flags is not None
            else None
        )
        counts = np.minimum(deg, k).astype(np.int32)

        # Vectorized scatter (no per-row python loop; N can be millions):
        # order entries within each row by descending weight so that a cap
        # keeps the top-k-by-weight, scatter into [N, k], then re-sort each
        # row by node id (pads sort to the end as id == n).
        rows = np.repeat(np.arange(n, dtype=np.int64), deg)
        if max_deg > k:
            order = np.lexsort((-csr.weights, rows))
        else:
            order = np.arange(csr.nnz, dtype=np.int64)
        r_sorted = rows[order]
        pos_in_row = np.arange(csr.nnz, dtype=np.int64) - np.repeat(
            csr.indptr[:-1], deg
        )
        keep = pos_in_row < k
        rk, pk, ok = r_sorted[keep], pos_in_row[keep], order[keep]
        nbrs[rk, pk] = csr.indices[ok]
        vals[rk, pk] = csr.weights[ok]
        if rks is not None:
            rks[rk, pk] = entry_ranks[ok]
        if flg is not None:
            flg[rk, pk] = entry_flags[ok]
        if max_deg > k:
            resort = np.argsort(nbrs, axis=1, kind="stable")
            nbrs = np.take_along_axis(nbrs, resort, axis=1)
            vals = np.take_along_axis(vals, resort, axis=1)
            if rks is not None:
                rks = np.take_along_axis(rks, resort, axis=1)
            if flg is not None:
                flg = np.take_along_axis(flg, resort, axis=1)
        return PaddedRows(
            nbrs=jnp.asarray(nbrs),
            vals=jnp.asarray(vals) if with_vals else None,
            counts=jnp.asarray(counts),
            ranks=jnp.asarray(rks) if rks is not None else None,
            flags=jnp.asarray(flg) if flg is not None else None,
            cap=k,
            num_nodes=n,
        )

    def overflow_rows(self, csr: CSRGraph) -> int:
        deg = csr.indptr[1:] - csr.indptr[:-1]
        return int((deg > self.cap).sum())


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nb", "slot_edge", "ov_src", "ov_dst", "ov_edge",
                 "w_slots", "ov_w"],
    meta_fields=["cap", "num_nodes", "num_edges"],
)
@dataclasses.dataclass(frozen=True)
class ELLAdjacency:
    """Hybrid ELL + overflow-COO layout of the dst-sorted propagation
    adjacency, for the scatter-free SpMM (:func:`lpformer_tpu.ops.spmm
    .spmm_ell`).

    Each destination row keeps its first ``cap`` in-edges in a dense
    [N, cap] slot grid (``nb`` = source ids, pad 0; ``slot_edge`` = index
    into the dst-sorted edge array, pad ``num_edges`` so the padded slot
    reads weight 0.0 from the extended weight vector). In-edges beyond
    ``cap`` (hub rows) stay as a COO remainder handled by the ordinary
    gather + sorted-segment-sum path. ``cap`` is chosen by
    :func:`ELLAdjacency.from_sorted_coo`'s cost model so slot padding
    never outweighs the scatter it removes.

    Measured on v5e (N=50k, E=400k, D=128): the dense-slot formulation
    runs the same E row-gathers but replaces the sorted scatter-add with
    an einsum reduction — 2.5x faster than gather+segment_sum (the
    scatter is ~2x the gather's cost; see VERDICT round-2 probes).
    """

    nb: jnp.ndarray         # [N, cap] int32 source ids, pad 0
    slot_edge: jnp.ndarray  # [N, cap] int32 edge index, pad num_edges
    ov_src: jnp.ndarray     # [E_ov] int32 (dst-sorted remainder)
    ov_dst: jnp.ndarray     # [E_ov] int32
    ov_edge: jnp.ndarray    # [E_ov] int32 edge index
    cap: int
    num_nodes: int
    num_edges: int
    # static GCN-norm weights laid out for the slots (unmasked training /
    # eval; per-batch masked weights re-gather from w_norm instead)
    w_slots: Optional[jnp.ndarray] = None  # [N, cap] f32, pad 0.0
    ov_w: Optional[jnp.ndarray] = None     # [E_ov] f32

    # Relative cost of an overflow edge (scatter-add) vs an ELL slot
    # (gather + multiply-add). Per-row latencies measured on v5e via the
    # step profile (scripts/profile_step.py): scatter ~13 ns/row vs slot
    # gather ~2 ns/row, both latency- not bandwidth-bound -> ~6.5.
    # (Round-2's first guess of 2.5 chose cap=8 on the collab-like graph,
    # leaving 60% of edges in the overflow scatter — the profile showed
    # the overflow path then costs nearly as much as plain COO.)
    _OVERFLOW_COST = 6.5

    def with_weights(self, w_norm: np.ndarray) -> "ELLAdjacency":
        """Attach static slot-laid-out weights (host, numpy)."""
        w_ext = np.concatenate(
            [np.asarray(w_norm, np.float32), np.zeros(1, np.float32)]
        )
        return dataclasses.replace(
            self,
            w_slots=jnp.asarray(w_ext[np.asarray(self.slot_edge)]),
            ov_w=jnp.asarray(w_ext[np.asarray(self.ov_edge)]),
        )

    @staticmethod
    def from_sorted_coo(
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        num_nodes: int,
        max_cap: int = 128,
    ) -> Optional["ELLAdjacency"]:
        """Build from a (dst, src)-sorted COO edge list. Returns None when
        the cost model prefers the pure-COO path (cap 0 optimal)."""
        e = len(edge_dst)
        if e == 0 or num_nodes == 0:
            return None
        deg = np.bincount(edge_dst, minlength=num_nodes)
        cmax = int(min(deg.max(), max_cap))
        # overflow(c) = sum_v max(deg_v - c, 0) = sum_{i > c} t[i] where
        # t[i] = #nodes with degree >= i (so overflow(0) == E)
        hist = np.bincount(deg)
        t = np.cumsum(hist[::-1])[::-1]
        suf = np.concatenate([np.cumsum(t[::-1])[::-1], [0.0]])
        over = suf[1:cmax + 2]  # overflow at cap c for c in [0, cmax]
        cost = (num_nodes * np.arange(cmax + 1)
                + ELLAdjacency._OVERFLOW_COST * over)
        cap = int(np.argmin(cost))
        if cap == 0:
            return None
        indptr = np.concatenate([[0], np.cumsum(deg)])
        pos = np.arange(e, dtype=np.int64) - indptr[edge_dst]
        main = pos < cap
        nb = np.zeros((num_nodes, cap), np.int32)
        slot_edge = np.full((num_nodes, cap), e, np.int32)
        nb[edge_dst[main], pos[main]] = edge_src[main]
        slot_edge[edge_dst[main], pos[main]] = np.nonzero(main)[0]
        ov = np.nonzero(~main)[0].astype(np.int32)
        return ELLAdjacency(
            nb=jnp.asarray(nb),
            slot_edge=jnp.asarray(slot_edge),
            ov_src=jnp.asarray(edge_src[ov].astype(np.int32)),
            ov_dst=jnp.asarray(edge_dst[ov].astype(np.int32)),
            ov_edge=jnp.asarray(ov),
            cap=cap,
            num_nodes=num_nodes,
            num_edges=e,
        )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["nbs", "slot_edges", "w_slots", "outmap"],
    meta_fields=["caps", "num_nodes", "num_edges"],
)
@dataclasses.dataclass(frozen=True)
class BucketedELL:
    """Degree-bucketed ELL layout: a fully scatter-free SpMM operand.

    The single-cap hybrid ELL (:class:`ELLAdjacency`) wastes slots on a
    skewed degree distribution (empty slots below the cap) *and* spills
    hub edges to a scatter-add overflow path — on the v5e step profile
    both halves ran at ~60-75 GB/s and together cost ~3.5x the pure
    gather. Here destination rows are grouped into power-of-two degree
    tiers; tier ``t`` stores its rows as a dense [Nb_t, cap_t] slot grid
    (cap_t = 2^t, except the last tier which uses the exact max degree).
    Every edge lands in exactly one slot — no overflow COO, no
    scatter-add anywhere — and slot padding is bounded by 2x (< 1.5x in
    practice). Per-tier outputs are concatenated and un-permuted with one
    [N]-row gather (``outmap``; rows with degree 0 map to a zeros row).

    This replaces the torch_sparse CSR SpMM the reference leans on
    (reference: src/models/other_models.py:35-48,66) with a layout whose
    hot loop is nothing but dense row gathers + einsum reductions.
    """

    nbs: tuple          # per tier: [Nb_t, cap_t] int32 src ids, pad 0
    slot_edges: tuple   # per tier: [Nb_t, cap_t] int32 edge idx, pad E
    w_slots: Optional[tuple]  # per tier: [Nb_t, cap_t] f32 static norm, or None
    outmap: jnp.ndarray  # [N] int32 -> row of concat(tier outputs) ‖ zeros row
    caps: tuple         # per tier cap_t (static)
    num_nodes: int
    num_edges: int

    @staticmethod
    def from_sorted_coo(
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        num_nodes: int,
        w_norm: Optional[np.ndarray] = None,
        with_edge_ids: bool = True,
    ) -> Optional["BucketedELL"]:
        """Build from a (dst, src)-sorted COO edge list (host, numpy).
        ``w_norm`` attaches static slot weights (the host-precomputed GCN
        normalization); per-batch masked weights re-gather via
        ``slot_edges`` instead — pass ``with_edge_ids=False`` to skip
        storing them (~slots x 4 bytes of HBM) when only the static
        weights will ever be used (e.g. BlockedBELL tiles)."""
        e = len(edge_dst)
        if e == 0 or num_nodes == 0:
            return None
        edge_src = np.asarray(edge_src)
        edge_dst = np.asarray(edge_dst)
        deg = np.bincount(edge_dst, minlength=num_nodes)
        indptr = np.concatenate([[0], np.cumsum(deg)])
        pos = np.arange(e, dtype=np.int64) - indptr[edge_dst]
        max_deg = int(deg.max())
        caps_all = []
        c = 1
        while c < max_deg:
            caps_all.append(c)
            c *= 2
        caps_all.append(max_deg)
        caps_all = sorted(set(caps_all))
        tier_of = np.searchsorted(caps_all, deg)  # deg <= caps_all[t]
        tier_of_edge = tier_of[edge_dst]
        w_ext = (
            None if w_norm is None
            else np.concatenate(
                [np.asarray(w_norm, np.float32), np.zeros(1, np.float32)]
            )
        )
        nbs, slot_edges, w_slots, caps = [], [], [], []
        outmap = np.full(num_nodes, -1, np.int64)
        offset = 0
        for t, cap in enumerate(caps_all):
            rows = np.nonzero((deg > 0) & (tier_of == t))[0]
            if len(rows) == 0:
                continue
            nb_rows = len(rows)
            n_pad = nb_rows + ((-nb_rows) % 8)  # sublane-align tier rows
            nb = np.zeros((n_pad, cap), np.int32)
            se = np.full((n_pad, cap), e, np.int64)
            em = np.nonzero(tier_of_edge == t)[0]
            rowpos = np.empty(num_nodes, np.int64)
            rowpos[rows] = np.arange(nb_rows)
            r = rowpos[edge_dst[em]]
            p = pos[em]
            nb[r, p] = edge_src[em]
            se[r, p] = em
            outmap[rows] = offset + np.arange(nb_rows)
            offset += n_pad
            nbs.append(jnp.asarray(nb))
            if with_edge_ids:
                slot_edges.append(jnp.asarray(se.astype(np.int32)))
            if w_ext is not None:
                w_slots.append(jnp.asarray(w_ext[se]))
            caps.append(int(cap))
        outmap[deg == 0] = offset  # zeros row appended by the op
        return BucketedELL(
            nbs=tuple(nbs),
            slot_edges=tuple(slot_edges) if with_edge_ids else None,
            w_slots=tuple(w_slots) if w_ext is not None else None,
            outmap=jnp.asarray(outmap.astype(np.int32)),
            caps=tuple(caps),
            num_nodes=num_nodes,
            num_edges=e,
        )

    @property
    def slot_total(self) -> int:
        return sum(nb.shape[0] * nb.shape[1] for nb in self.nbs)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["sl", "dl", "tw", "te"],
    meta_fields=["block", "kb", "num_nodes", "num_edges"],
)
@dataclasses.dataclass(frozen=True)
class BlockedCOO:
    """(dst_block x src_block)-tiled COO: the SpMM operand for LARGE node
    tables.

    bench.py --gather measured TPU row gathers from a [1M, 64] table at
    54 Mrows/s vs 337 Mrows/s from a [131k, 64] table — the gather
    engine's row rate degrades ~6x with the addressed footprint. Tiling
    the edge list so every gather addresses one <=16 MB table slice
    recovers the fast rate; the dst-block split keeps each tile's
    segment_sum output small and dst-sorted. The (3 GCN layers x
    fwd+bwd) neighbor gathers are the dominant cost of the
    citation2-like step per the op profile (scripts/profile_step.py).

    Per-tile arrays in tile order ``t = jj * kb + ii`` (jj = dst block,
    ii = src block), dst-sorted within each tile, padded to a multiple
    of 1024 (pad: weight 0, dst_local = block -> dummy segment row,
    src_local = 0).
    """

    sl: tuple            # per tile: [E_t] int32 src - ii*block
    dl: tuple            # per tile: [E_t] int32 dst - jj*block (pad: block)
    tw: Optional[tuple]  # per tile: [E_t] f32 static normalized weights
    te: Optional[tuple]  # per tile: [E_t] int32 original edge index (pad E)
                         # for dynamic re-weighting (--mask-input)
    block: int
    kb: int
    num_nodes: int
    num_edges: int

    @staticmethod
    def from_coo(
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        num_nodes: int,
        w_norm: Optional[np.ndarray] = None,
        block: int = 131072,
        pad_to: int = 1024,
        with_edge_ids: bool = True,
    ) -> Optional["BlockedCOO"]:
        e = len(edge_dst)
        if e == 0 or num_nodes == 0:
            return None
        src = np.asarray(edge_src, np.int64)
        dst = np.asarray(edge_dst, np.int64)
        kb = -(-num_nodes // block)
        jb = dst // block
        ib = src // block
        order = np.lexsort((dst, ib, jb))
        s, d = src[order], dst[order]
        key = jb[order] * kb + ib[order]
        bounds = np.searchsorted(key, np.arange(kb * kb + 1))
        w = None if w_norm is None else np.asarray(w_norm, np.float32)[order]
        sl, dl, tw, te = [], [], [], []
        for t in range(kb * kb):
            lo, hi = int(bounds[t]), int(bounds[t + 1])
            ii, jj = t % kb, t // kb
            s_t = (s[lo:hi] - ii * block).astype(np.int32)
            d_t = (d[lo:hi] - jj * block).astype(np.int32)
            w_t = None if w is None else w[lo:hi]
            e_t = order[lo:hi].astype(np.int32)
            m = hi - lo
            p = (-m) % pad_to if m else pad_to
            if p:
                s_t = np.concatenate([s_t, np.zeros(p, np.int32)])
                d_t = np.concatenate([d_t, np.full(p, block, np.int32)])
                if w_t is not None:
                    w_t = np.concatenate([w_t, np.zeros(p, np.float32)])
                e_t = np.concatenate([e_t, np.full(p, e, np.int32)])
            sl.append(jnp.asarray(s_t))
            dl.append(jnp.asarray(d_t))
            if w_t is not None:
                tw.append(jnp.asarray(w_t))
            if with_edge_ids:
                te.append(jnp.asarray(e_t))
        return BlockedCOO(
            sl=tuple(sl),
            dl=tuple(dl),
            tw=tuple(tw) if w is not None else None,
            te=tuple(te) if with_edge_ids else None,
            block=block,
            kb=kb,
            num_nodes=num_nodes,
            num_edges=e,
        )

    @property
    def slot_total(self) -> int:
        return sum(int(a.shape[0]) for a in self.sl)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["tiles"],
    meta_fields=["block", "kb", "num_nodes", "num_edges"],
)
@dataclasses.dataclass(frozen=True)
class BlockedBELL:
    """(dst_block x src_block)-tiled degree-bucketed ELL: scatter-free
    SpMM with slice-local gathers — the big-graph production layout.

    BlockedCOO fixed the gather-footprint problem (row rate from a
    [576k-1M, 64] table is 53-86 Mrows/s vs ~291-340 from a <=16 MB
    slice) but reintroduced a per-tile sorted segment_sum, which the r5
    ppa-like profile showed running ~4x above the gather rate (one
    [131073, 64] fusion x 150 calls = 85% of the 2.77 s step).
    BucketedELL is scatter-free but gathers from the full table.
    This layout composes both: every tile is a small BucketedELL whose
    rows are dst-local and whose slot ids are src-local, so the per-tile
    sweep is dense slot gathers from one x-slice + einsum + ONE
    [rows_jj]-row un-permute gather; dst-block accumulation is a plain
    elementwise add. No scatter anywhere, every gather small-operand.

    Static weights only (w_slots prelaid): dynamic re-weighting
    (--mask-input) keeps the BlockedCOO path (data/dataset.py selects).
    """

    tiles: tuple         # kb*kb entries: BucketedELL (dst-local rows,
                         # src-local slot ids, static w_slots) or None
    block: int
    kb: int
    num_nodes: int
    num_edges: int

    @staticmethod
    def from_coo(
        edge_src: np.ndarray,
        edge_dst: np.ndarray,
        num_nodes: int,
        w_norm: np.ndarray,
        block: int = 131072,
    ) -> Optional["BlockedBELL"]:
        """Build from a (dst, src)-sorted COO with static normalized
        weights (host, numpy)."""
        e = len(edge_dst)
        if e == 0 or num_nodes == 0:
            return None
        kb = -(-num_nodes // block)
        if kb <= 1:
            return None
        src = np.asarray(edge_src)
        dst = np.asarray(edge_dst)
        w = np.asarray(w_norm, np.float32)
        sb = src // block
        db = dst // block
        tiles = []
        for jj in range(kb):
            rows_jj = min(block, num_nodes - jj * block)
            mj = db == jj
            for ii in range(kb):
                m = mj & (sb == ii)
                if not m.any():
                    tiles.append(None)
                    continue
                # masking a dst-sorted list preserves dst order, which
                # is all from_sorted_coo needs
                tiles.append(BucketedELL.from_sorted_coo(
                    (src[m] - ii * block).astype(np.int32),
                    (dst[m] - jj * block).astype(np.int32),
                    rows_jj,
                    w_norm=w[m],
                    with_edge_ids=False,
                ))
        return BlockedBELL(
            tiles=tuple(tiles),
            block=block,
            kb=kb,
            num_nodes=num_nodes,
            num_edges=e,
        )

    @property
    def slot_total(self) -> int:
        return sum(t.slot_total for t in self.tiles if t is not None)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "x",
        "edge_src",
        "edge_dst",
        "edge_w",
        "edge_rank",
        "adj_rows",
        "ppr_rows",
        "degree",
        "ell",
        "blk",
        "bbell",
        "w_norm",
        "w_diag",
    ],
    meta_fields=["num_nodes", "num_edges"],
)
@dataclasses.dataclass(frozen=True)
class GraphBundle:
    """Device-side graph state for one adjacency variant (train or test).

    Mirrors the role of the reference's ``data`` dict entries
    (reference: src/util/read_datasets.py:85-129):
      adj_t     -> (edge_src, edge_dst, edge_w) COO sorted by dst, for SpMM
      adj_mask  -> adj_rows (binarized padded rows, for context extraction)
      ppr       -> ppr_rows (padded PPR rows with values)
      degree    -> degree
    """

    x: jnp.ndarray          # [N, F] node features
    edge_src: jnp.ndarray   # [E] int32, COO sorted by (dst, src)
    edge_dst: jnp.ndarray   # [E] int32
    edge_w: jnp.ndarray     # [E] float32 (raw weights; GCN-norm applied in op)
    edge_rank: Optional[jnp.ndarray]  # [E] int32 train-edge ranks (mask_input)
    adj_rows: PaddedRows    # binarized, symmetric adjacency
    ppr_rows: PaddedRows    # personalized-PageRank rows (values = ppr scores)
    degree: jnp.ndarray     # [N] float32 out-degrees of raw edge_index
    num_nodes: int
    num_edges: int
    # hybrid ELL layout of (edge_src, edge_dst) for the scatter-free
    # SpMM; None -> the COO gather+segment_sum path
    ell: Optional[ELLAdjacency] = None
    # (dst_block x src_block)-tiled COO for LARGE node tables (the
    # gather row rate from big tables degrades ~6x — see BlockedCOO);
    # preferred over ell/COO when present
    blk: Optional[BlockedCOO] = None
    # (dst_block x src_block)-tiled bucketed ELL: scatter-free
    # slice-local SpMM for LARGE node tables with STATIC weights — the
    # production big-graph layout; preferred over blk/ell/COO when
    # present (see BlockedBELL)
    bbell: Optional[BlockedBELL] = None
    # host-precomputed static GCN normalization of edge_w (unmasked
    # training + eval; ~23 ms/step of in-jit recompute on v5e otherwise).
    # Per-batch masked weights (--mask-input) recompute in-jit.
    w_norm: Optional[jnp.ndarray] = None   # [E] f32
    w_diag: Optional[jnp.ndarray] = None   # [N] f32 self-loop coefficient
