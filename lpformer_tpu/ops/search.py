"""Batched sorted-row membership / value lookup.

Two interchangeable methods (identical results, different TPU cost):

  * ``binary``  — vmapped ``jnp.searchsorted`` ('scan'): O(Q log K) but
    each round is a dependent take_along_axis gather; on TPU the serial
    gather chain dominates (measured ~50-120 ms for [4096, 256]x256).
  * ``onehot``  — compare-all: eq[b, q, k] = (rows[b,k] == q[b,q]),
    reduced immediately over k. O(Q*K) VPU compares with no gathers;
    XLA fuses the compare with the reduction so the [B, Q, K] tensor is
    never materialized. Wins decisively for K <= ~512 (the padded-row
    caps this framework uses); processed in query chunks to bound the
    fusion working set.

``row_search`` (which must return the match *position*) stays binary;
the hot paths only need membership + value lookups and use onehot.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# chunk so B * Qc * K stays ~256M lanes per fused reduction; the floor
# keeps huge-batch shapes (ppa-like: B=32768, K=256) from exploding into
# dozens of tiny dots whose launch gaps dominate (r4 trace: ~2.5 ms of
# inter-op gaps on the collab extraction at the old 64M/no-floor policy)
_CHUNK_LANES = 256 * 1024 * 1024
_CHUNK_MIN_Q = 32


def row_search(
    rows: jnp.ndarray, queries: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(found, clipped insertion position) via binary search."""
    pos = jax.vmap(lambda r, q: jnp.searchsorted(r, q, side="left"))(
        rows, queries
    )
    pos_c = jnp.clip(pos, 0, rows.shape[1] - 1)
    found = jnp.take_along_axis(rows, pos_c, axis=1) == queries
    return found, pos_c


def _q_chunks(b: int, q: int, k: int) -> int:
    per_q = max(b * k, 1)
    qc = max(_CHUNK_MIN_Q, _CHUNK_LANES // per_q)
    return min(q, qc)


def _fused_lookup_enabled() -> bool:
    """Opt-in switch for the Pallas lookup kernel — measured SLOWER than
    the XLA fused reduce on v5e (see :func:`row_member_values`); kept as
    an option for hardware where the trade flips."""
    import os

    return (
        os.environ.get("LPFORMER_FUSED_LOOKUP", "0") == "1"
        and jax.default_backend() == "tpu"
    )


def _as_i32_bits(va: jnp.ndarray) -> jnp.ndarray:
    """Reinterpret a value array as int32 lanes (bit pattern for floats)."""
    if jnp.issubdtype(va.dtype, jnp.floating):
        return jax.lax.bitcast_convert_type(
            va.astype(jnp.float32), jnp.int32
        )
    return va.astype(jnp.int32)


def _from_i32_bits(raw: jnp.ndarray, dtype) -> jnp.ndarray:
    if jnp.issubdtype(jnp.dtype(dtype), jnp.floating):
        return jax.lax.bitcast_convert_type(raw, jnp.float32).astype(dtype)
    return raw.astype(dtype)


def fused_row_member_values(
    rows: jnp.ndarray,
    queries: jnp.ndarray,
    value_arrays: Sequence[jnp.ndarray] = (),
    defaults: Sequence = (),
    interpret: bool = False,
) -> Tuple[jnp.ndarray, list]:
    """Pallas-kernel variant of :func:`row_member_values` (opt-in via
    LPFORMER_FUSED_LOOKUP=1): the equality tensor stays in VMEM and
    values ride single int32 bit-pattern lanes with exact integer
    accumulation — bit-identical results (ops/pallas/lookup.py), but
    measured SLOWER on v5e (2.36 ms for [4096,256]x96 L=2 vs ~1 ms for
    the XLA fused reduce: Mosaic's select+add reduce runs ~1
    vreg-op/cycle, the same engine XLA already saturates)."""
    from lpformer_tpu.ops.pallas.lookup import fused_lookup

    b, k = rows.shape
    cols = [_as_i32_bits(va) for va in value_arrays]
    cols.append(jnp.ones((b, k), jnp.int32))
    out = fused_lookup(
        rows, queries, jnp.stack(cols, axis=1), interpret=interpret
    )                                                # [B, L, Q] i32
    found = out[:, -1, :] > 0
    out_vals = []
    for i, va in enumerate(value_arrays):
        v = _from_i32_bits(out[:, i, :], va.dtype)
        if defaults and defaults[i] is not None:
            v = jnp.where(found, v, jnp.asarray(defaults[i], va.dtype))
        out_vals.append(v)
    return found, out_vals


def row_member_values(
    rows: jnp.ndarray,                  # [B, K] sorted node ids (pad >= n)
    queries: jnp.ndarray,               # [B, Q]
    value_arrays: Sequence[jnp.ndarray] = (),   # each [B, K]
    defaults: Sequence = (),
    with_found: bool = True,
) -> Tuple[jnp.ndarray, list]:
    """One pass: membership of each query in its row, plus the row value
    at the matched position for each value array (``defaults`` where
    absent). Padding never matches because pad ids exceed real ids and
    queries are real ids (or pads, which only match pads — callers mask
    those out via their own validity masks).

    The equality tensor is reduced with a single batched ``dot_general``
    (values stacked with a ones column for the membership count). A dot
    is opaque to XLA fusion, so the O(Q*K) compare loop is built exactly
    once instead of being duplicated into every consumer fusion
    (measured ~10x on the full train step). On TPU, XLA lowers these
    few-lane contractions to fused compare+select+reduce VPU loops (the
    [B, Q, K] equality tensor is never materialized — profiled r4), so
    THE COST SCALES WITH THE LANE COUNT: pass ``with_found=False`` when
    the membership bit is unused to drop the ones lane (absent queries
    then simply reduce to 0 in every value lane, which requires pad
    entries of ``value_arrays`` to be 0 — PaddedRows guarantees that).
    Two rejected alternatives, both measured slower on v5e r4:
    8-bit-chunked bf16 lanes for a true MXU dot (8.70 ms vs 7.19 ms for
    the extraction microbench: 4x the lanes outweigh the cheaper
    element ops) and a Pallas VMEM kernel (LPFORMER_FUSED_LOOKUP=1,
    see :func:`fused_row_member_values`).

    Float values ride f32 lanes directly; INTEGER arrays (edge ranks
    can exceed the 2^24 f32-exact range — ogbl-citation2 has ~30M
    unique train edges) are split into two 15-bit halves, each exact in
    f32, and reassembled after the reduction.

    The dot_general MUST run at Precision.HIGHEST: TPU DEFAULT matmul
    precision truncates f32 inputs to bf16 (8 mantissa bits), which
    silently rounds the 15-bit halves (verified on v5e: stored -1 came
    back -32768) and the float value lanes. (When XLA picks the fused
    VPU reduce the math is f32 regardless; HIGHEST keeps the contract
    if it ever materializes on the MXU instead.)
    """
    if _fused_lookup_enabled():
        found, out_vals = fused_row_member_values(
            rows, queries, value_arrays, defaults
        )
        return (found if with_found else None), out_vals
    b, k = rows.shape
    q = queries.shape[1]
    lanes = []          # (value_index, kind) per f32 lane
    cols = []
    for i, va in enumerate(value_arrays):
        if jnp.issubdtype(va.dtype, jnp.integer):
            v64 = va.astype(jnp.int32)
            cols.append((v64 >> 15).astype(jnp.float32))
            cols.append((v64 & 0x7FFF).astype(jnp.float32))
            lanes.append((i, "int_hi"))
            lanes.append((i, "int_lo"))
        else:
            cols.append(va.astype(jnp.float32))
            lanes.append((i, "float"))
    if with_found:
        cols.append(jnp.ones((b, k), jnp.float32))
    assert cols, "with_found=False requires at least one value array"
    stacked = (
        jnp.stack(cols, axis=-1) if len(cols) > 1 else cols[0][:, :, None]
    )                                                    # [B, K, L(+1)]
    qc = _q_chunks(b, q, k)
    outs = []
    for lo in range(0, q, qc):
        hi = min(lo + qc, q)
        eq = (rows[:, None, :] == queries[:, lo:hi, None]).astype(
            jnp.float32
        )                                                # [B, qc, K]
        outs.append(
            jax.lax.dot_general(
                eq, stacked, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,  # exactness (docstring)
            )                                            # [B, qc, L(+1)]
        )
    out = jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]
    found = out[..., -1] > 0.5 if with_found else None
    out_vals = [None] * len(value_arrays)
    li = 0
    while li < len(lanes):
        i, kind = lanes[li]
        va = value_arrays[i]
        if kind == "int_hi":
            hi_part = out[..., li].astype(jnp.int32)
            lo_part = out[..., li + 1].astype(jnp.int32)
            v = ((hi_part << 15) | lo_part).astype(va.dtype)
            li += 2
        else:
            v = out[..., li].astype(va.dtype)
            li += 1
        if defaults and defaults[i] is not None:
            assert with_found, "defaults need the membership lane"
            v = jnp.where(found, v, jnp.asarray(defaults[i], va.dtype))
        out_vals[i] = v
    return found, out_vals


def row_contains(rows: jnp.ndarray, queries: jnp.ndarray) -> jnp.ndarray:
    """Membership only (onehot method)."""
    found, _ = row_member_values(rows, queries)
    return found


def row_lookup(
    rows: jnp.ndarray,
    vals: jnp.ndarray,
    queries: jnp.ndarray,
    default,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(found, value-or-default) for each query (onehot method)."""
    found, (v,) = row_member_values(rows, queries, (vals,), (default,))
    return found, v


def row_lookup_value(
    rows: jnp.ndarray,
    vals: jnp.ndarray,
    queries: jnp.ndarray,
) -> jnp.ndarray:
    """Value-only lookup with an implicit 0.0 default: skips the
    membership lane entirely, which halves the fused-reduce work (the
    VPU cost scales with the lane count — r4 profiling). Requires pad
    entries of ``vals`` to be 0 (PaddedRows guarantees it)."""
    _, (v,) = row_member_values(
        rows, queries, (vals,), (None,), with_found=False
    )
    return v
