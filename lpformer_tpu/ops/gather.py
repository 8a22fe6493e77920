"""Gathers with TPU-friendly custom backward passes.

XLA's automatic transpose of a gather is an *unsorted* scatter-add,
which serializes badly on TPU. Structured replacements:

  * ``gather_rows(table, ids)`` — on TPU at production sizes the
    backward routes through the Pallas sorted tile-partitioned
    scatter-add (``ops/pallas/scatter.py``): sort rows by id, then
    one-hot x chunk MXU matmuls into VMEM tile accumulators. Small or
    off-TPU cases use a plain ``segment_sum`` (measured faster than
    sort + sorted segment_sum in XLA alone — the XLA sorted path still
    lowers to the same scatter HLO).
  * ``spmm`` symmetric backward lives in ops/spmm.py: for a symmetric
    adjacency, d/dx of A@x is A@ct — the same dst-sorted kernel, no
    unsorted scatter at all.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# flattened-row threshold below which the Pallas scatter's fixed costs
# (sort + permute + worklist) outweigh the serialized-scatter savings
_PALLAS_MIN_ROWS = 65536


def _use_pallas_scatter(m: int, d: int) -> bool:
    if os.environ.get("LPFORMER_TPU_NO_PALLAS_SCATTER"):
        return False
    # d == 64 rides the kernel lane-padded to 128 (measured 93 -> 67 ms
    # for 5.24M rows into [1M, 64] on v5e vs unsorted segment_sum)
    return (
        jax.default_backend() == "tpu"
        and m >= _PALLAS_MIN_ROWS
        and (d % 128 == 0 or d == 64)
    )


@jax.custom_vjp
def gather_rows(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """table [N, D]; ids int of any shape -> table[ids] [..., D]."""
    return table[ids]


def _gather_fwd(table, ids):
    # zero-size carrier for the primal dtype (dtypes aren't JAX types)
    proto = jnp.zeros((0,), table.dtype)
    return table[ids], (ids, table.shape[0], proto)


def _gather_bwd(res, ct):
    ids, n, proto = res
    dtype = proto.dtype
    d = ct.shape[-1]
    ct2 = ct.reshape(-1, d)
    if _use_pallas_scatter(ct2.shape[0], d):
        from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

        if d % 128 != 0:  # lane-pad to the (8, 128) fast path
            ct2 = jnp.pad(ct2, ((0, 0), (0, 128 - d)))
        dtable = scatter_rows_add(ids.reshape(-1), ct2, n)[:, :d]
    else:
        # measured on v5e at [4096, 320] ids into [50001, 128]: plain
        # unsorted segment_sum (22 ms) beats XLA sort + sorted
        # segment_sum (33 ms)
        dtable = jax.ops.segment_sum(
            ct2.astype(jnp.float32), ids.reshape(-1), num_segments=n,
        )
    ids_ct = np.zeros(ids.shape, dtype=jax.dtypes.float0)
    # accumulate in f32, cast once to the primal dtype (bf16 tables)
    return dtable.astype(dtype), ids_ct


gather_rows.defvjp(_gather_fwd, _gather_bwd)


@jax.custom_vjp
def gather_rows_valid(
    table: jnp.ndarray, ids: jnp.ndarray, valid: jnp.ndarray
) -> jnp.ndarray:
    """``gather_rows`` for id tables with a validity mask: invalid
    slots' ids are spread over real rows for forward-gather speed
    (link_transformer._gather_ids), so their cotangents — exactly zero
    by construction — would otherwise be scatter-added to random real
    rows in the backward. Declaring validity lets the Pallas scatter
    DROP the dead rows: they never enqueue worklist steps and their
    permute reads collapse to one cached row (in-step the permute is
    4 KB-tile-read-amplification-bound, so at 70-98% dead slots this
    is most of its cost)."""
    return table[ids]


def _gather_valid_fwd(table, ids, valid):
    proto = jnp.zeros((0,), table.dtype)
    return table[ids], (ids, valid, table.shape[0], proto)


def _gather_valid_bwd(res, ct):
    ids, valid, n, proto = res
    dtype = proto.dtype
    d = ct.shape[-1]
    ct2 = ct.reshape(-1, d)
    if _use_pallas_scatter(ct2.shape[0], d):
        from lpformer_tpu.ops.pallas.scatter import scatter_rows_add

        if d % 128 != 0:
            ct2 = jnp.pad(ct2, ((0, 0), (0, 128 - d)))
        dtable = scatter_rows_add(
            ids.reshape(-1), ct2, n, live=valid.reshape(-1)
        )[:, :d]
    else:
        # dead cotangents are exactly zero — the plain segment_sum path
        # needs no mask
        dtable = jax.ops.segment_sum(
            ct2.astype(jnp.float32), ids.reshape(-1), num_segments=n,
        )
    f0 = jax.dtypes.float0
    return (dtable.astype(dtype),
            np.zeros(ids.shape, dtype=f0), np.zeros(valid.shape, dtype=f0))


gather_rows_valid.defvjp(_gather_valid_fwd, _gather_valid_bwd)
