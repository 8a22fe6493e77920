"""Pallas TPU kernel: fused per-link context attention.

Replaces the XLA sequence
  xj = keys @ W_r ; z = leaky_relu(xj * q) ; logits = z . att ;
  alpha = masked_softmax(logits) ; out = sum_C alpha * xj
with one kernel that keeps a batch-block of keys and its transformed
form resident in VMEM, writing only the [Bb, H*O] result to HBM — the
intermediate [B, C, H*O] tensor never round-trips through HBM.

Layout per grid step (grid over batch blocks):
  keys   [Bb, C, Dk]  -> VMEM block
  w_r    [Dk, H*O]    -> VMEM (whole, shared across blocks)
  q      [Bb, H*O]    -> VMEM block  (precomputed e1+e2 per link)
  att    [H, O]       -> VMEM
  valid  [Bb, C]      -> VMEM block (f32 0/1)
  out    [Bb, H*O]

The matmul runs on the MXU as [Bb*C, Dk] @ [Dk, H*O]; everything else
is VPU elementwise with the softmax over the C axis.

Used on the eval path (train path keeps the XLA composition, whose
backward is already structured); falls back to interpret mode off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(keys_ref, q_ref, valid_ref, w_ref, rbias_ref, att_ref,
            bias_ref, out_ref, *, heads: int):
    bb, c, dk = keys_ref.shape
    ho = w_ref.shape[1]
    o = ho // heads

    keys = keys_ref[:].reshape(bb * c, dk)
    xj = jnp.dot(keys, w_ref[:], preferred_element_type=jnp.float32)
    xj = (xj + rbias_ref[:][None]).reshape(bb, c, heads, o)

    q = q_ref[:].reshape(bb, 1, heads, o)
    z = xj * q
    z = jnp.where(z >= 0, z, 0.2 * z)                       # leaky_relu
    logits = jnp.sum(z * att_ref[:][None, None], axis=-1)   # [Bb, C, H]

    v = valid_ref[:][:, :, None]                            # [Bb, C, 1]
    masked = jnp.where(v > 0, logits, _NEG)
    m = jnp.maximum(jnp.max(masked, axis=1, keepdims=True), _NEG / 2)
    e = jnp.exp(masked - m) * v
    denom = jnp.maximum(jnp.sum(e, axis=1, keepdims=True), 1e-16)
    alpha = e / denom                                       # [Bb, C, H]

    out = jnp.sum(alpha[..., None] * xj, axis=1)            # [Bb, H, O]
    out_ref[:] = out.reshape(bb, ho) + bias_ref[:][None]


@functools.partial(jax.jit, static_argnames=("heads", "block_b", "interpret"))
def fused_link_attention(
    keys: jnp.ndarray,    # [B, C, Dk] = [node feats ‖ pe]
    q: jnp.ndarray,       # [B, H*O]   = lin_l(e1) + lin_l(e2)
    valid: jnp.ndarray,   # [B, C] bool
    w_r: jnp.ndarray,     # [Dk, H*O]
    r_bias: jnp.ndarray,  # [H*O]   lin_r bias
    att: jnp.ndarray,     # [H, O]
    bias: jnp.ndarray,    # [H*O]   output bias
    heads: int = 1,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    b, c, dk = keys.shape
    ho = w_r.shape[1]
    if block_b <= 0:
        # size the batch block so kernel VMEM (inputs + intermediates,
        # double-buffered) stays well under the ~16MB budget
        per_row = c * (dk + 3 * ho + 8) * 4 * 2
        block_b = max(1, min(int(8e6 // max(per_row, 1)), 256))
        while b % block_b != 0:
            block_b -= 1
    if b % block_b != 0:
        block_b = 1
    grid = (b // block_b,)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, ho), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, c, dk), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dk, ho), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ho,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ho,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, ho), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(keys, q, valid.astype(jnp.float32), w_r, r_bias, att, bias)
