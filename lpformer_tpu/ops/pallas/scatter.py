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
— sortedness makes each tile's rows a contiguous chunk range, so the
worklist has at most ``nchunks + ntiles`` entries. Each step builds a
one-hot membership matrix [T, R] on the VPU (compare-all against the
tile's local iota — out-of-tile and sentinel rows simply never match)
and accumulates ``onehot @ ct_chunk`` on the MXU into a VMEM accumulator,
written once per tile (scratch + final write; accumulating into the
output block relayouts badly in Mosaic). The random-access scatter
becomes sequential streams + dense matmuls.

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
    jax.jit, static_argnames=("n", "tile", "chunk", "interpret")
)
def _scatter_sorted(ids, ct, n, tile, chunk, interpret):
    m, d = ct.shape
    nchunks = -(-m // chunk)
    ntiles = -(-n // tile)
    sentinel = ntiles * tile

    # sort rows by destination id; sentinel-pad to whole chunks plus one
    # extra all-sentinel chunk: the no-op target for padded worklist
    # entries and for tiles whose id range holds no rows
    ids_s, perm = jax.lax.sort([ids.astype(jnp.int32),
                                jnp.arange(m, dtype=jnp.int32)], num_keys=1)
    pad = nchunks * chunk - m
    ids_p = jnp.concatenate(
        [ids_s, jnp.full((pad,), sentinel, jnp.int32)])
    # [nchunks+1, 1, chunk]: the trailing (1, chunk) pair equals the
    # array's own last two dims, which Mosaic accepts as a block shape
    # (a flat (1, chunk) block fails the 8-sublane divisibility rule)
    ids2d = jnp.concatenate(
        [ids_p, jnp.full((chunk,), sentinel, jnp.int32)]
    ).reshape(nchunks + 1, 1, chunk)
    # pad the PERMUTATION, not the gathered rows: one gather produces the
    # padded chunk layout directly (pad rows re-read row 0 but carry
    # sentinel ids, so they never match a tile) — avoids a second full
    # copy of the cotangent
    perm_p = jnp.concatenate(
        [perm, jnp.zeros((pad + chunk,), jnp.int32)])
    ct2d = jnp.take(ct, perm_p, axis=0).reshape(nchunks + 1, chunk, d)

    # per-tile sorted-row ranges -> contiguous chunk ranges
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * tile
    starts = jnp.searchsorted(ids_p, bounds, side="left").astype(jnp.int32)
    s, e = starts[:-1], starts[1:]
    nonempty = e > s
    c_lo = jnp.where(nonempty, s // chunk, nchunks)
    n_t = jnp.where(nonempty, -(-e // chunk) - s // chunk, 1)
    offs = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(n_t).astype(jnp.int32)])

    nsteps = nchunks + ntiles  # static bound on sum(n_t)
    wids = jnp.arange(nsteps, dtype=jnp.int32)
    t_of = (jnp.searchsorted(offs[1:], wids, side="right")
            .astype(jnp.int32))
    live = wids < offs[-1]
    t_of = jnp.where(live, jnp.minimum(t_of, ntiles - 1), ntiles - 1)
    c_of = jnp.where(live, c_lo[t_of] + (wids - offs[t_of]), nchunks)
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
    interpret: bool = False,
) -> jnp.ndarray:
    """sum ct rows into their ids: out [n, D] f32; ids any shape, ct
    ``ids.shape + (D,)``. D must be a multiple of 128 (lane width)."""
    d = ct.shape[-1]
    ids = ids.reshape(-1)
    ct = ct.reshape(-1, d)
    return _scatter_sorted(ids, ct, n, tile, chunk, interpret)
