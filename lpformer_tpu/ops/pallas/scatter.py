"""Pallas TPU kernel: sorted tile-partitioned scatter-add of rows.

``scatter_rows_add(ids, ct, n)`` computes ``out[i] = sum_{ids[r]==i} ct[r]``
— the transpose of a row gather. XLA lowers this to an unsorted
scatter-add whose per-row random read-modify-write runs at ~150 GB/s
effective on v5e (18 ms for 1.31M x 128 rows in the step profile); it is
the single most expensive op in the training step (the backward of the
context gather, reference: src/models/link_transformer.py:434-481 pulls
context node features per link).

TPU-native replacement: sort the rows by destination id (cheap bitonic
sort + one fast gather to permute the cotangent), partition the id space
into tiles of ``T`` ids, and walk a worklist of (tile, row-chunk) pairs
— sortedness makes each tile's rows a contiguous chunk range. Each step
builds a one-hot membership matrix [T, R] on the VPU (compare-all
against the tile's local iota — out-of-tile and sentinel rows simply
never match) and accumulates ``onehot @ ct_chunk`` on the MXU into a
VMEM accumulator, written once per tile (scratch + final write;
accumulating into the output block relayouts badly in Mosaic). The
random-access scatter becomes sequential streams + dense matmuls.

SEGMENTED layout (round 4): a single global sort makes the cotangent
permutation a random gather over the FULL [M, D] footprint — at
M=1.31M x 128 bf16 that is a 336 MB window, where the gather engine
runs ~6x below its small-footprint rate (bench --gather; this permute
was 20.5% of the whole train step in the r4 op profile). Sorting
independently within segments of ``seg_rows`` rows keeps every
permutation access inside a <=16 MB window (the measured fast-rate
region) and turns the global sort into a cheaper batched per-segment
sort. Each tile then owns up to one chunk-range per segment instead of
one global range — the worklist grows by <= ntiles*(nseg-1) no-op-free
entries and the kernel itself is unchanged.

The worklist (tile id per step, chunk id per step) rides the scalar-
prefetch path so block index_maps can follow data-dependent chunk
ranges with a static grid.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(wt_ref, wc_ref, ids_blk, ct_blk, out_blk, acc_ref):
    w = pl.program_id(0)
    t = wt_ref[w + 1]
    tile, chunk = acc_ref.shape[0], ids_blk.shape[-1]

    @pl.when(wt_ref[w] != t)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    local = ids_blk[0] - t * tile                     # [1, R]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tile, chunk), 0)
    onehot = (rows == local).astype(ct_blk.dtype)     # [T, R]
    acc_ref[:] += jnp.dot(
        onehot, ct_blk[:].reshape(chunk, ct_blk.shape[-1]),
        preferred_element_type=jnp.float32,
    )

    @pl.when(wt_ref[w + 2] != t)
    def _():
        out_blk[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("n", "tile", "chunk", "seg_rows", "interpret"),
)
def _scatter_sorted(ids, ct, n, tile, chunk, seg_rows, interpret,
                    live=None):
    m, d = ct.shape
    ntiles = -(-n // tile)
    sentinel = ntiles * tile

    ids = ids.astype(jnp.int32)
    if live is not None:
        # DEAD rows (cotangents of invalid context slots — exactly zero
        # by construction, and their ids are spread over real rows for
        # forward-gather speed, link_transformer._gather_ids): remap to
        # the sort sentinel so they cluster at segment tails, never
        # enqueue worklist steps, and their permute reads collapse to
        # the cached row 0. At 70-98% dead slots this removes most of
        # the permute's 4 KB-tile read amplification.
        ids = jnp.where(live.reshape(-1), ids, sentinel)

    # --- segmented sort + within-segment permute ---
    # seg_rows must be a multiple of chunk so segment chunk boundaries
    # line up with the kernel's block grid
    seg_rows = max(chunk, (seg_rows // chunk) * chunk)
    nseg = max(1, -(-m // seg_rows))
    m_pad = nseg * seg_rows
    ids_p = jnp.concatenate(
        [ids, jnp.full((m_pad - m,), sentinel, jnp.int32)]
    ).reshape(nseg, seg_rows)
    iota = jnp.broadcast_to(
        jnp.arange(seg_rows, dtype=jnp.int32)[None, :], (nseg, seg_rows)
    )
    # batched sort: each segment sorted independently along the last axis
    ids_s, perm_local = jax.lax.sort([ids_p, iota], num_keys=1)
    # permute the cotangent WITHIN each segment window via ONE flat 2D
    # row gather (global indices = seg offset + local perm): the gather
    # walks segment-by-segment so its working set stays in the gather
    # engine's fast-rate region, AND it keeps the plain-2D lowering —
    # a batched take_along_axis falls off the fast row-gather path
    # (measured in-step: 17 ms vs 7.35 ms for the global 2D permute).
    # Pad the PERMUTATION, not the cotangent: pad/sentinel positions
    # clamp to row 0 whose ids never match a tile, so no zero-padded
    # copy of ct is ever materialized.
    # Permute via PER-SEGMENT static-shape takes. The TPU row-gather's
    # rate is set by the STATIC operand size, not the dynamic access
    # pattern: in-step, gathering 1.31M bf16[*,128] rows ran at
    # 542 Mrows/s from a [50k] table but 178 Mrows/s from the [1.31M]
    # cotangent — even when 98% of indices pointed into one cached 1 MB
    # window. Slicing the cotangent into [seg_rows] operands (static
    # shapes + optimization_barrier so XLA cannot re-fuse them into one
    # big-operand gather — the BlockedCOO lesson, ops/spmm.py) keeps
    # every take in the fast-mode regime. Out-of-segment positions
    # (tail pads, dead rows) read a cycling 4096-row window: one fixed
    # row would serialize the engine (measured 16.5 ms), and their
    # sorted ids are the sentinel which no tile ever matches.
    alive = ((perm_local + (jnp.arange(nseg, dtype=jnp.int32)
                            * seg_rows)[:, None]) < m) & (ids_s < sentinel)
    cyc = jax.lax.broadcasted_iota(
        jnp.int32, (nseg, seg_rows), 1)
    perm_seg = jnp.where(alive, perm_local, cyc % min(seg_rows, 4096))
    nchunks = m_pad // chunk
    outs = []
    for i in range(nseg):
        lo = i * seg_rows
        width = min(seg_rows, m - lo)
        part = jax.lax.dynamic_slice_in_dim(ct, lo, width, 0)
        if width < seg_rows:
            part = jnp.concatenate(
                [part, jnp.zeros((seg_rows - width, d), ct.dtype)], 0
            )
        part = jax.lax.optimization_barrier(part)
        outs.append(jnp.take(part, perm_seg[i], axis=0))
    outs.append(jnp.zeros((chunk, d), ct.dtype))  # sentinel chunk
    ct2d = jnp.concatenate(outs, axis=0).reshape(nchunks + 1, chunk, d)
    # chunked id streams + one trailing all-sentinel chunk (the no-op
    # target for padded worklist entries and empty (tile, seg) pairs)
    ids2d = jnp.concatenate(
        [ids_s.reshape(-1), jnp.full((chunk,), sentinel, jnp.int32)]
    ).reshape(nchunks + 1, 1, chunk)

    # per-(segment, tile) sorted-row ranges -> contiguous chunk ranges
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = jax.vmap(
        lambda row: jnp.searchsorted(row, bounds, side="left")
    )(ids_s).astype(jnp.int32)                      # [nseg, ntiles+1]
    seg_off = (jnp.arange(nseg, dtype=jnp.int32) * seg_rows)[:, None]
    s = starts[:, :-1] + seg_off                    # global row starts
    e = starts[:, 1:] + seg_off
    nonempty = e > s
    c_lo = jnp.where(nonempty, s // chunk, nchunks)     # [nseg, ntiles]
    n_t = jnp.where(nonempty, -(-e // chunk) - s // chunk, 0)
    # ensure every tile has >= 1 step so its output block gets written
    # (route the extra step to the sentinel chunk via c_lo=nchunks)
    first_empty = (n_t.sum(axis=0) == 0)
    n_t = n_t.at[0].set(jnp.where(first_empty, 1, n_t[0]))
    c_lo = c_lo.at[0].set(jnp.where(first_empty, nchunks, c_lo[0]))

    # tile-major worklist: for tile t, all segments' chunk ranges
    n_tile = n_t.sum(axis=0)                        # [ntiles]
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(n_tile).astype(jnp.int32)])
    # within a tile, segment sub-offsets
    seg_offs = jnp.cumsum(n_t, axis=0).astype(jnp.int32)  # inclusive
    seg_offs = jnp.concatenate(
        [jnp.zeros((1, ntiles), jnp.int32), seg_offs[:-1]], axis=0
    )

    # worst case: every chunk appears once, plus per (tile, seg) one
    # boundary chunk, plus per tile the write-guarantee step
    nsteps = nchunks + ntiles * nseg + ntiles
    wids = jnp.arange(nsteps, dtype=jnp.int32)
    t_of = (jnp.searchsorted(offs[1:], wids, side="right")
            .astype(jnp.int32))
    live = wids < offs[-1]
    t_of = jnp.where(live, jnp.minimum(t_of, ntiles - 1), ntiles - 1)
    # position within the tile's steps -> (segment, chunk)
    pos = wids - offs[t_of]                          # [nsteps]
    s_of = jax.vmap(
        lambda p, t: jnp.searchsorted(
            seg_offs[:, t], p, side="right"
        ).astype(jnp.int32) - 1
    )(pos, t_of)
    c_of = c_lo[s_of, t_of] + (pos - seg_offs[s_of, t_of])
    c_of = jnp.where(live, c_of, nchunks)
    # wt[0] / wt[-1] sentinels make the first/last steps open/flush
    wt = jnp.concatenate([jnp.full((1,), -1, jnp.int32), t_of,
                          jnp.full((1,), -2, jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nsteps,),
        in_specs=[
            pl.BlockSpec((1, 1, chunk), lambda w, wt, wc: (wc[w], 0, 0)),
            pl.BlockSpec((1, chunk, d), lambda w, wt, wc: (wc[w], 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (tile, d), lambda w, wt, wc: (wt[w + 1], 0)),
        scratch_shapes=[pltpu.VMEM((tile, d), jnp.float32)],
    )
    out = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ntiles * tile, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(wt, c_of, ids2d, ct2d)
    return out[:n]


def scatter_rows_add(
    ids: jnp.ndarray,
    ct: jnp.ndarray,
    n: int,
    tile: int = 512,
    chunk: int = 512,
    seg_rows: int = 131072,
    interpret: bool = False,
    live: jnp.ndarray = None,
) -> jnp.ndarray:
    """sum ct rows into their ids: out [n, D] f32; ids any shape, ct
    ``ids.shape + (D,)``. D must be a multiple of 128 (lane width).

    ``seg_rows``: permutation-locality window (rows). Measured on v5e
    at the collab-like VJP shape (m=1.31M, d=128, bf16), chained
    standalone calls with fully-live uniform ids: single segment
    354.9 ms vs 27.9 ms at seg_rows=131072 (scripts/scatter_ab.py).

    ``live``: optional bool mask (ids.shape). Rows with live=False are
    DROPPED — their values must be irrelevant to the caller (in the
    gather VJP they are exactly-zero cotangents of invalid context
    slots). In-step the permute is bound by 4 KB-tile read
    amplification (1.31M bf16 row reads drag ~5.4 GB), so dropping the
    70-98% dead rows is the dominant win."""
    d = ct.shape[-1]
    ids = ids.reshape(-1)
    ct = ct.reshape(-1, d)
    return _scatter_sorted(ids, ct, n, tile, chunk, seg_rows, interpret,
                           live=live)
