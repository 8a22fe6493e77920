"""Pallas TPU kernels: fused per-link context attention, forward + backward.

Replaces the XLA sequence (reference: src/modules/layers.py:193-224)
  xj = keys @ W_r ; z = leaky_relu(xj * q) ; logits = z . att ;
  alpha = masked_softmax(logits) ; out = sum_C alpha * xj
with one kernel that streams the context axis as a grid dimension with
an ONLINE masked softmax (flash-attention style): per C-tile, transform
the keys on the MXU, score on the VPU, and fold into running
(max, denom, weighted-sum) accumulators held in VMEM scratch. The
[B, C, H*O] transformed-keys tensor never exists in HBM and only one
tile of it ever exists in VMEM.

The backward is the flash-attention two-pass recipe adapted to the
GATv2 scoring function: the forward saves only the per-row softmax
stats (running max m and denominator l); the backward re-streams the
same C tiles, recomputes xj/alpha per tile, and accumulates
dkeys/dq/dW/db/datt in VMEM — so training also never materializes
[B, C, H*O] in HBM (kills the transient-dot memory pressure that
forces remat+grad-accum on ddi-like shapes; reference needs a >32GB
GPU there, README.md:42).

Both kernels are specialized for num_heads == 1 (every published config,
scripts/replicate_*.sh): all tensors stay 2-D, which keeps Mosaic's
sublane/lane tiling happy. Falls back to interpret mode off-TPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


# --------------------------------------------------------------------------
# forward kernel
# --------------------------------------------------------------------------

def _fwd_kernel(keys_ref, q_ref, valid_ref, w_ref, rbias_ref, att_ref,
                bias_ref, out_ref, m_out_ref, l_out_ref,
                m_ref, l_ref, acc_ref):
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
        m_out_ref[:] = m_ref[:]
        l_out_ref[:] = l_ref[:]


def _fwd_call(keys, q, valid_f, w_r, r_bias, att, bias,
              block_b, c_tile, interpret):
    b, c, dk = keys.shape
    ho = w_r.shape[1]
    grid = (b // block_b, c // c_tile)
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, ho), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ),
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
        out_specs=(
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, 128), jnp.float32),
            pltpu.VMEM((block_b, ho), jnp.float32),
        ],
        interpret=interpret,
    )(keys, q, valid_f, w_r, r_bias, att, bias)


# --------------------------------------------------------------------------
# backward kernel
# --------------------------------------------------------------------------

def _bwd_kernel(keys_ref, q_ref, valid_ref, g_ref, m_ref, l_ref, delta_ref,
                w_ref, rbias_ref, att_ref,
                dkeys_ref, dq_ref, dw_ref, drb_ref, datt_ref,
                dq_scr, dw_scr, drb_scr, datt_scr):
    """Re-streams the C tiles: recompute xj / alpha from the saved softmax
    stats, then one MXU pass each for dkeys (dxj @ W^T) and dW
    (keys^T @ dxj). All reductions accumulate in VMEM *scratch* across
    the sequential TPU grid and are written to the output refs once at
    the final step — the forward kernel's compiled pattern (accumulating
    into output blocks trips Mosaic relayout errors)."""
    bb, ct, dk = keys_ref.shape
    ho = w_ref.shape[1]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nb, nc = pl.num_programs(0), pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        dq_scr[:] = jnp.zeros((bb, ho), jnp.float32)

    @pl.when(jnp.logical_and(i == 0, j == 0))
    def _():
        dw_scr[:] = jnp.zeros((dk, ho), jnp.float32)
        drb_scr[:] = jnp.zeros((bb, ho), jnp.float32)
        datt_scr[:] = jnp.zeros((bb, ho), jnp.float32)

    # NOTE on shapes: Mosaic rejects reshapes that collapse the lane dim
    # ([bb, ct] -> [bb*ct, 1]) and relayouts of [bb, 1, O] broadcasts.
    # This kernel therefore sticks strictly to the op vocabulary the
    # forward kernel compiles with: jnp.repeat row-broadcasts in 2-D,
    # (bb*ct, O) <-> (bb, ct, O) leading-dim reshapes,
    # [bb, ct, 1] * [bb, ct, O] broadcasts, axis=-1 / axis=1 reductions,
    # and plain 2-D MXU matmuls.
    keys2 = keys_ref[:].reshape(bb * ct, dk)
    xj2 = jnp.dot(keys2, w_ref[:], preferred_element_type=jnp.float32) \
        + rbias_ref[:][None]                                    # [bb*ct, O]
    xj3 = xj2.reshape(bb, ct, ho)
    qb = jnp.repeat(q_ref[:], ct, axis=0)                       # [bb*ct, O]
    pre2 = xj2 * qb
    z2 = jnp.where(pre2 >= 0, pre2, 0.2 * pre2)                 # [bb*ct, O]
    att_row = att_ref[:].reshape(1, ho)
    logits = jnp.sum((z2 * att_row).reshape(bb, ct, ho), axis=-1)
    v = valid_ref[:]
    logits = jnp.where(v > 0, logits, _NEG)                     # [bb, ct]

    m = m_ref[:][:, :1]                                         # [bb, 1]
    l = jnp.maximum(l_ref[:][:, :1], 1e-16)
    alpha = jnp.exp(logits - m) / l * v                         # [bb, ct]

    gb = jnp.repeat(g_ref[:], ct, axis=0)                       # [bb*ct, O]
    # dalpha[b,c] = g[b] . xj[b,c]
    galpha = jnp.sum((gb * xj2).reshape(bb, ct, ho), axis=-1)   # [bb, ct]
    delta = delta_ref[:][:, :1]                                 # [bb, 1]
    dlogits = alpha * (galpha - delta)                          # [bb, ct]
    dlog3 = dlogits[:, :, None]                                 # [bb, ct, 1]

    datt_scr[:] = datt_scr[:] + jnp.sum(
        dlog3 * z2.reshape(bb, ct, ho), axis=1)                 # [bb, O]

    # fold att into the leaky-relu slope while still 2-D
    sa2 = jnp.where(pre2 >= 0, 1.0, 0.2) * att_row              # [bb*ct, O]
    dpre3 = dlog3 * sa2.reshape(bb, ct, ho)                     # [bb, ct, O]
    axj3 = alpha[:, :, None] * gb.reshape(bb, ct, ho)
    dxj3 = axj3 + dpre3 * qb.reshape(bb, ct, ho)                # [bb, ct, O]
    dxj2 = dxj3.reshape(bb * ct, ho)

    # both MXU passes run in the keys dtype (bf16 when the model's key
    # tables are bf16; f32 accumulation via preferred_element_type)
    dxj2c = dxj2.astype(keys2.dtype)
    dkeys_ref[:] = jnp.dot(
        dxj2c, w_ref[:].T, preferred_element_type=jnp.float32
    ).reshape(bb, ct, dk).astype(dkeys_ref.dtype)
    dw_scr[:] = dw_scr[:] + jnp.dot(
        keys2.T, dxj2c, preferred_element_type=jnp.float32)
    drb_scr[:] = drb_scr[:] + jnp.sum(dxj3, axis=1)             # [bb, O]
    dq_scr[:] = dq_scr[:] + jnp.sum(dpre3 * xj3, axis=1)        # [bb, O]

    @pl.when(j == nc - 1)
    def _():
        dq_ref[:] = dq_scr[:]

    @pl.when(jnp.logical_and(i == nb - 1, j == nc - 1))
    def _():
        dw_ref[:] = dw_scr[:]
        drb_ref[:] = jnp.sum(drb_scr[:], axis=0, keepdims=True)
        datt_ref[:] = jnp.sum(datt_scr[:], axis=0, keepdims=True)


def _bwd_call(keys, q, valid_f, g, m, l, delta, w_r, r_bias, att,
              block_b, c_tile, interpret):
    b, c, dk = keys.shape
    ho = w_r.shape[1]
    grid = (b // block_b, c // c_tile)
    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b, c, dk), keys.dtype),
            jax.ShapeDtypeStruct((b, ho), jnp.float32),
            jax.ShapeDtypeStruct((dk, ho), jnp.float32),
            jax.ShapeDtypeStruct((1, ho), jnp.float32),
            jax.ShapeDtypeStruct((1, ho), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, c_tile, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, c_tile), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dk, ho), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ho,), lambda i, j: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]),
                         lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, c_tile, dk), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dk, ho), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ho), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((block_b, ho), jnp.float32),
            pltpu.VMEM((dk, ho), jnp.float32),
            pltpu.VMEM((block_b, ho), jnp.float32),
            pltpu.VMEM((block_b, ho), jnp.float32),
        ],
        interpret=interpret,
    )(keys, q, valid_f, g, m, l, delta, w_r, r_bias, att)


# --------------------------------------------------------------------------
# custom-VJP wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused(keys, q, valid_f, w_r, r_bias, att, bias,
           block_b, c_tile, interpret):
    out, _, _ = _fwd_call(keys, q, valid_f, w_r, r_bias, att, bias,
                          block_b[0], c_tile, interpret)
    return out


def _fused_fwd(keys, q, valid_f, w_r, r_bias, att, bias,
               block_b, c_tile, interpret):
    out, m, l = _fwd_call(keys, q, valid_f, w_r, r_bias, att, bias,
                          block_b[0], c_tile, interpret)
    return out, (keys, q, valid_f, w_r, r_bias, att, bias, m, l, out)


def _fused_bwd(block_b, c_tile, interpret, res, g):
    keys, q, valid_f, w_r, r_bias, att, bias, m, l, out = res
    g = g.astype(jnp.float32)
    # delta[b] = g . (out - bias)  (softmax-jacobian common term)
    delta = jnp.sum(g * (out - bias[None]), axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (delta.shape[0], 128))
    dkeys, dq, dw, drb, datt = _bwd_call(
        keys, q, valid_f, g, m, l, delta, w_r, r_bias, att,
        block_b[1], c_tile, interpret,
    )
    dbias = jnp.sum(g, axis=0)
    return (dkeys, dq, jnp.zeros_like(valid_f), dw.astype(w_r.dtype),
            drb.reshape(-1), datt.reshape(att.shape), dbias)


_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

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
    """Differentiable fused per-link attention (see module docstring).

    Safe under jax.grad: a flash-style custom VJP re-streams the context
    tiles instead of materializing [B, C, H*O] activations.
    """
    assert heads == 1, "fused TPU kernel is specialized for num_heads == 1"
    b, c, dk = keys.shape
    ho = w_r.shape[1]
    # lane-dim tiling wants C tiles of 128: pad the context axis with
    # invalid entries (masked out of the softmax)
    c_tile = min(128, c)
    kbytes = 2 if keys.dtype == jnp.bfloat16 else 4

    def _fit_bb(bb, n_key_blocks, n_temps):
        # Mosaic's scoped-VMEM limit is 16 MB. Per grid step the kernel
        # holds n_key_blocks double-buffered [bb, ct, dk] key blocks
        # (keys in; +dkeys out in the backward) plus ~n_temps live
        # [bb*ct, ho] f32 intermediates on the stack (xj/z/dxj/...).
        # bb=32 f32 bwd measured 16.27M (272K over); bb=32 bf16 bwd
        # 19.38M — both OOM, so size bb to stay under ~14 MB.
        while bb > 1 and (2 * n_key_blocks * bb * c_tile * dk * kbytes
                          + n_temps * bb * c_tile * ho * 4) > 14 << 20:
            bb //= 2
        while b % bb != 0 and bb > 1:
            bb //= 2
        return bb

    if block_b <= 0:
        # bb=8 everywhere drowns in grid overhead (1536 steps at the
        # collab-like shape); take the largest bb that fits each pass
        bb_fwd = _fit_bb(32, 1, 4)
        bb_bwd = _fit_bb(32, 2, 9)
    else:
        bb_fwd = bb_bwd = block_b
    c_pad = -(-c // c_tile) * c_tile
    if c_pad != c:
        keys = jnp.pad(keys, ((0, 0), (0, c_pad - c), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, c_pad - c)))
    # bf16 key tables stay bf16 end-to-end: the [B, C, Dk] stream is the
    # kernel's dominant HBM traffic in both directions (dots accumulate
    # f32 via preferred_element_type, softmax stats are f32 throughout)
    kdt = jnp.bfloat16 if keys.dtype == jnp.bfloat16 else jnp.float32
    return _fused(
        keys.astype(kdt), q.astype(jnp.float32),
        valid.astype(jnp.float32), w_r.astype(kdt), r_bias, att, bias,
        (bb_fwd, bb_bwd), c_tile, interpret,
    )
