"""Per-batch positive-edge masking, as a static-shape int32 device op.

The reference rebuilds a sparse adjacency from scratch every batch after
dropping the batch's positive edges (reference:
src/train/train_model.py:38-45) — a dynamic-shape sparse rebuild. Here the
adjacency is static, and masking happens in *edge-rank space*:

  * Host precompute: every undirected train edge gets a rank — its index
    in the sorted unique canonical-key list (canonical key of (u, v) =
    min*N+max, int64 on host only). Every padded-adjacency entry and every
    propagation edge carries its rank as an int32 side array. TPUs have no
    fast int64, so device code never sees a 64-bit key.
  * Device per batch: each batch edge's rank is recovered by looking up
    tgt in the padded row of src (adjacency == symmetrized train
    positives, so the entry exists). The mask is materialized as a dense
    boolean *bitmap over ranks* [U]; membership tests are a single
    gather (binary-searching a sorted list measured ~10x slower on TPU).

Exact multiplicity semantics are preserved: ogbl-collab's train set has
duplicate (u, v) pairs (one per collaboration year), and the reference's
rebuild only removes an undirected edge from the adjacency support when
*every* duplicate instance lands in the current batch. We precompute each
edge's multiplicity and mask a rank only when its batch count reaches it.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph.containers import CSRGraph, PaddedRows
from lpformer_tpu.ops.search import row_lookup

# distinct from the -1 "no rank" padding. A plain int, NOT jnp.int32:
# a module-level device constant would initialize the XLA backend at
# import time, which breaks jax.distributed.initialize (multi-host
# bring-up must precede any backend-touching call).
_NOT_FOUND = -2


def train_edge_info(
    train_src: np.ndarray, train_dst: np.ndarray, num_nodes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Host: sorted unique canonical keys (int64) of train positives and
    their multiplicities (int32)."""
    lo = np.minimum(train_src, train_dst).astype(np.int64)
    hi = np.maximum(train_src, train_dst).astype(np.int64)
    keys = lo * num_nodes + hi
    uniq, counts = np.unique(keys, return_counts=True)
    return uniq.astype(np.int64), counts.astype(np.int32)


def edge_ranks_for_entries(
    src: np.ndarray,
    dst: np.ndarray,
    uniq_keys: np.ndarray,
    num_nodes: int,
) -> np.ndarray:
    """Host: int32 rank per (src, dst) entry; -1 where not a train edge."""
    lo = np.minimum(src, dst).astype(np.int64)
    hi = np.maximum(src, dst).astype(np.int64)
    keys = lo * num_nodes + hi
    pos = np.searchsorted(uniq_keys, keys)
    pos_c = np.clip(pos, 0, max(len(uniq_keys) - 1, 0))
    found = (
        uniq_keys[pos_c] == keys if len(uniq_keys) else np.zeros_like(keys, bool)
    )
    return np.where(found, pos_c, -1).astype(np.int32)


def edge_ranks_for_csr(
    csr: CSRGraph, uniq_keys: np.ndarray
) -> np.ndarray:
    """Host: ranks aligned with the CSR's entry order."""
    src, dst, _ = csr.to_coo()
    return edge_ranks_for_entries(src, dst, uniq_keys, csr.num_nodes)


def link_edge_ranks(
    adj_nbrs_s: jnp.ndarray,   # [B, A] src adjacency rows
    adj_ranks_s: jnp.ndarray,  # [B, A] their edge ranks
    tgt: jnp.ndarray,          # [B]
    adj_nbrs_t: jnp.ndarray,   # [B, A] tgt adjacency rows
    adj_ranks_t: jnp.ndarray,  # [B, A]
    src: jnp.ndarray,          # [B]
) -> jnp.ndarray:
    """Device: int32 rank of each batch edge (src, tgt), recovered from
    either direction's padded row: with a per-row cap a high-degree
    endpoint may have dropped the entry, but it survives in the other
    row unless BOTH endpoints overflow their caps. -2 when not found."""
    _, rank_f = row_lookup(
        adj_nbrs_s, adj_ranks_s, tgt[:, None].astype(jnp.int32), _NOT_FOUND
    )
    _, rank_b = row_lookup(
        adj_nbrs_t, adj_ranks_t, src[:, None].astype(jnp.int32), _NOT_FOUND
    )
    return jnp.where(rank_f[:, 0] >= 0, rank_f[:, 0], rank_b[:, 0])


def bitmap_from_link_ranks(
    rank: jnp.ndarray,
    multiplicities: jnp.ndarray,
    weight: jnp.ndarray = None,
) -> jnp.ndarray:
    """Scatter per-link edge ranks into the [U] masked-rank bitmap: a
    rank is masked iff the batch contains at least as many instances of
    the edge as its train multiplicity (collab duplicate-edge semantics).

    ``weight``: optional [B] per-link weights — zero-weight entries
    (padding of a ragged last batch) are NOT counted."""
    u = multiplicities.shape[0]
    rank_c = jnp.clip(rank, 0, u - 1)
    ones = (rank >= 0).astype(jnp.int32)
    if weight is not None:
        ones = ones * (weight > 0).astype(jnp.int32)
    counts = jnp.zeros((u,), jnp.int32).at[rank_c].add(ones)
    return counts >= multiplicities


def batch_mask_ranks(
    adj_rows: PaddedRows,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    multiplicities: jnp.ndarray,
    weight: jnp.ndarray = None,
) -> jnp.ndarray:
    """Device: boolean bitmap [U] over edge ranks, True = masked for this
    batch (single-device entry: local row gathers + scatter)."""
    assert adj_rows.ranks is not None, "adjacency rows need rank side-array"
    rank = link_edge_ranks(
        adj_rows.nbrs[src], adj_rows.ranks[src], tgt,
        adj_rows.nbrs[tgt], adj_rows.ranks[tgt], src,
    )
    return bitmap_from_link_ranks(rank, multiplicities, weight)


def rank_is_masked(
    mask_bitmap: jnp.ndarray, entry_ranks: jnp.ndarray
) -> jnp.ndarray:
    """Membership of entry ranks (int32, -1 = not a train edge) in the
    masked set. Shape-preserving.

    A direct ``bitmap[ranks]`` element gather serializes on TPU (~3.2 ms
    per [4096, 96] lookup in the step profile — XLA lowers 1-D element
    gathers row-by-row). Instead the bitmap is viewed as [U/128, 128]
    so the lookup is a vectorized 128-lane ROW gather (same fast path as
    feature gathers) followed by a VPU lane one-hot select: ~6x faster
    at the same semantics."""
    u = mask_bitmap.shape[0]
    if u == 0:
        return jnp.zeros(entry_ranks.shape, bool)
    rows = -(-u // 128)
    bm2 = jnp.pad(mask_bitmap, (0, rows * 128 - u)).reshape(rows, 128)
    rc = jnp.clip(entry_ranks, 0, u - 1)
    g = bm2[rc >> 7]                                  # [..., 128] rows
    lanes = jax.lax.broadcasted_iota(jnp.int32, g.shape, g.ndim - 1)
    hit = jnp.any(g & (lanes == (rc & 127)[..., None]), axis=-1)
    return hit & (entry_ranks >= 0)


def mask_edge_weights(
    mask_bitmap: jnp.ndarray,
    edge_ranks: jnp.ndarray,
    edge_w: jnp.ndarray,
) -> jnp.ndarray:
    """Zero out weights of masked propagation edges — the ``--mask-input``
    variant (reference: src/train/train_model.py:47-57; note the reference
    builds that adjacency *unweighted*, so pass binarized weights)."""
    hit = rank_is_masked(mask_bitmap, edge_ranks)
    return jnp.where(hit, 0.0, edge_w)
