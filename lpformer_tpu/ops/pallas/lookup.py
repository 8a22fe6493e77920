"""Fused one-hot lookup kernel: the VMEM-resident form of the
compare-all membership/value reduction.

Computes, for each batch row b, value lane l, and query q:

    out[b, l, q] = sum_k (queries[b, q] == rows[b, k]) * lanes[b, l, k]

i.e. exactly the batched one-hot reduction behind
``ops/search.py:row_member_values`` (membership + PPR/rank lookups) and
``ops/context.py:_compact`` (budget compaction) — the static-shape
replacement for the reference's per-batch sparse-COO algebra
(reference: src/models/link_transformer.py:214-319). The XLA
formulation must materialize the [B, Q, K] equality tensor to HBM
between the compare fusion and the MXU dot (measured: the extraction
category ran at 48 GB/s effective, far from any engine ceiling —
step_budget.json r4); here it lives only in VMEM/vregs.

Exactness: everything rides int32 lanes (f32 values bitcast to their
bit patterns by the caller), the select is bitwise, and the reduction
is exact integer addition. Row ids are unique per row, so each real
query matches at most one entry and the sum IS that entry's value.
(Pad queries may match many pad row slots; their lanes are garbage —
including well-defined int32 wraparound — exactly as in the XLA
formulation, and callers mask them.) No MXU precision questions arise
because nothing touches the MXU: the compare + select + add stream is
pure VPU work, and the op is compute-bound at a few int-ops per
(q, k) cell instead of HBM-bound on a materialized equality tensor.

Layout: K rides the lane axis for ``rows`` and ``lanes`` (their natural
minor dim); the equality tile [bb, Q, kc] puts Q on sublanes — one
relayout of the query block per grid step — and the reduction over K is
a lane reduction, chunked so transients stay a few hundred KB.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LANE = 128
# contrib transient budget per (lane, k-chunk) round, bytes
_CONTRIB_BYTES = 2 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _kernel(r_ref, q_ref, s_ref, o_ref, *, k_chunk: int, n_l: int):
    # r_ref [bb, K] i32; q_ref [bb, Q] i32; s_ref [bb, Lp, K] i32;
    # o_ref [bb, Lp, Q] i32
    q = q_ref[...]                                   # [bb, Q]
    bb, l_p, q_p = o_ref.shape
    k_total = r_ref.shape[1]
    acc = jnp.zeros((bb, l_p, q_p), jnp.int32)
    for k0 in range(0, k_total, k_chunk):
        k1 = min(k0 + k_chunk, k_total)
        r = r_ref[:, k0:k1]                          # [bb, kc]
        eq = q[:, :, None] == r[:, None, :]          # [bb, Q, kc]
        parts = []
        for l in range(l_p):
            if l < n_l:
                sl = s_ref[:, l, k0:k1]              # [bb, kc]
                contrib = jnp.where(eq, sl[:, None, :], 0)
                parts.append(jnp.sum(contrib, axis=-1))   # [bb, Q]
            else:
                parts.append(jnp.zeros((bb, q_p), jnp.int32))
        acc = acc + jnp.stack(parts, axis=1)
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("interpret",))
def fused_lookup(
    rows: jnp.ndarray,      # [B, K] int32 (unique per row; pads < 0 ok)
    queries: jnp.ndarray,   # [B, Q] int32
    lanes: jnp.ndarray,     # [B, L, K] int32 value lanes (bitcast f32 ok)
    interpret: bool = False,
) -> jnp.ndarray:           # [B, L, Q] int32
    b, k = rows.shape
    q = queries.shape[1]
    n_l = lanes.shape[1]
    k_p = _round_up(k, _LANE)
    q_p = _round_up(q, _LANE)
    l_p = _round_up(n_l, 8)
    k_chunk = min(k_p, 256)
    # size the batch block so the [bb, Q, kc] int32 transient stays small
    block_b = max(8, min(64, _CONTRIB_BYTES // (q_p * k_chunk * 4)))
    b_p = _round_up(b, block_b)
    if k_p != k or b_p != b:
        # rows pad id -2: never equals a query (real ids >= 0, query pad -1)
        rows = jnp.pad(rows, ((0, b_p - b), (0, k_p - k)),
                       constant_values=-2)
        lanes = jnp.pad(lanes, ((0, b_p - b), (0, 0), (0, k_p - k)))
    if l_p != n_l:
        lanes = jnp.pad(lanes, ((0, 0), (0, l_p - n_l), (0, 0)))
    if q_p != q or b_p != b:
        queries = jnp.pad(queries, ((0, b_p - b), (0, q_p - q)),
                          constant_values=-1)

    out = pl.pallas_call(
        partial(_kernel, k_chunk=k_chunk, n_l=n_l),
        out_shape=jax.ShapeDtypeStruct((b_p, l_p, q_p), jnp.int32),
        grid=(b_p // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, k_p), lambda i: (i, 0)),
            pl.BlockSpec((block_b, q_p), lambda i: (i, 0)),
            pl.BlockSpec((block_b, l_p, k_p), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((block_b, l_p, q_p), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(rows, queries, lanes)
    return out[:b, :n_l, :q]
