"""Pallas TPU kernel: fused per-link context attention.

Replaces the XLA sequence
  xj = keys @ W_r ; z = leaky_relu(xj * q) ; logits = z . att ;
  alpha = masked_softmax(logits) ; out = sum_C alpha * xj
with one kernel that streams the context axis as a grid dimension with
an ONLINE masked softmax (flash-attention style): per C-tile, transform
the keys on the MXU, score on the VPU, and fold into running
(max, denom, weighted-sum) accumulators held in VMEM scratch. The
[B, C, H*O] transformed-keys tensor never exists in HBM and only one
tile of it ever exists in VMEM.

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
            bias_ref, out_ref, m_ref, l_ref, acc_ref, *, heads: int):
    """Specialized for heads == 1 (every published config): all tensors
    stay 2-D, which keeps Mosaic's sublane/lane tiling happy."""
    bb, ct, dk = keys_ref.shape
    ho = w_ref.shape[1]
    j = pl.program_id(1)
    n_ct = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full((bb, 128), _NEG / 2, jnp.float32)
        l_ref[:] = jnp.zeros((bb, 128), jnp.float32)
        acc_ref[:] = jnp.zeros((bb, ho), jnp.float32)

    xj = jnp.dot(
        keys_ref[:].reshape(bb * ct, dk), w_ref[:],
        preferred_element_type=jnp.float32,
    ) + rbias_ref[:][None]                                      # [bb*ct, O]
    q = q_ref[:]                                                # [bb, O]
    qb = jnp.repeat(q, ct, axis=0)                              # [bb*ct, O]
    z = xj * qb
    z = jnp.where(z >= 0, z, 0.2 * z)
    zatt = z * att_ref[:].reshape(1, ho)
    logits = jnp.sum(zatt.reshape(bb, ct, ho), axis=-1)         # [bb, ct]
    v = valid_ref[:]
    logits = jnp.where(v > 0, logits, _NEG)

    m0 = m_ref[:][:, :1]                                        # [bb, 1]
    m1 = jnp.maximum(m0, jnp.max(logits, axis=1, keepdims=True))
    corr = jnp.exp(m0 - m1)                                     # [bb, 1]
    e = jnp.exp(logits - m1) * v                                # [bb, ct]
    l0 = l_ref[:][:, :1]
    l_ref[:] = jnp.broadcast_to(l0 * corr + jnp.sum(e, axis=1, keepdims=True),
                                (bb, 128))
    # weighted sum: [bb, ct, 1] * [bb, ct, O] reduced over ct (VPU)
    wsum = jnp.sum(e[:, :, None] * xj.reshape(bb, ct, ho), axis=1)
    acc_ref[:] = acc_ref[:] * corr + wsum
    m_ref[:] = jnp.broadcast_to(m1, (bb, 128))

    @pl.when(j == n_ct - 1)
    def _():
        denom = jnp.maximum(l_ref[:][:, :1], 1e-16)
        out_ref[:] = acc_ref[:] / denom + bias_ref[:][None]




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
    assert heads == 1, "fused TPU kernel is specialized for num_heads == 1"
    b, c, dk = keys.shape
    ho = w_r.shape[1]
    if block_b <= 0:
        block_b = 8
        while b % block_b != 0 and block_b > 1:
            block_b //= 2
    # lane-dim tiling wants C tiles of 128: pad the context axis with
    # invalid entries (masked out of the softmax)
    c_tile = min(128, c) if c % 128 == 0 or c < 128 else 128
    c_pad = -(-c // c_tile) * c_tile
    if c_pad != c:
        keys = jnp.pad(keys, ((0, 0), (0, c_pad - c), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, c_pad - c)))
        c = c_pad
    grid = (b // block_b, c // c_tile)
    return pl.pallas_call(
        functools.partial(_kernel, heads=heads),
        out_shape=jax.ShapeDtypeStruct((b, ho), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, c_tile, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, c_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dk, ho), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ho,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ho,), lambda i, j: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, ho), jnp.float32),
        ],
        interpret=interpret,
    )(keys, q, valid.astype(jnp.float32), w_r, r_bias, att, bias)
