"""Fully-fused pairwise block: PPR positional encodings + per-link
attention in one Pallas TPU kernel pair (forward + flash-style backward).

The XLA composition of the pairwise block (reference semantics:
src/models/link_transformer.py:132-211 + src/modules/layers.py:193-224)
materializes, per attention layer and per pos/neg half, a chain of
[B, C, dim] HBM tensors: the PPR-encoder hiddens (one per node class per
symmetric direction), the folded pe projection, the transformed keys
xj, the leaky-relu scores, and their backward counterparts — measured at
~55-65 ms of the 127 ms v5e bench step (profile r2, scripts/
profile_step.py). This kernel keeps ALL of it in VMEM:

  in :  xj_node [B, C, O]  gathered pre-projected node keys
        ps, pt  [B, C]     ppr(src, v), ppr(tgt, v)
        q       [B, O]     lin_l(x_a) + lin_l(x_b)
        per-TILE class weights (see below)
  out:  out     [B, O]     attended + output-bias representation

Per (link, context) entry it recomputes, per C-tile on the fly:
  pe   = g_c(ps, pt) + g_c(pt, ps)          symmetric class-c PPR MLP
         where g_c(x) = relu(LN(x @ W1_c + b1_c)) @ (W2_c @ W_fold)
  xj   = xj_node + pe + cbias_c             (cbias folds 2*b2_c@W_fold
                                             and the lin_r bias)
  s    = att . leaky_relu(xj * q)           GATv2 scoring
  out  = sum_v softmax_v(s) * xj            online (flash) masked softmax

Class weights ride as stacked per-tile inputs ([T, ...] with a
program_id-indexed BlockSpec): every C-tile belongs to exactly one node
class because the context tables are class-blocked ([cn | 1hop | >1hop],
ops/context.py) and the tile size divides each class budget. No dynamic
weight indexing inside the kernel.

The backward re-streams the same tiles (grid transposed to (C-tiles,
B-blocks) so per-tile weight grads accumulate in VMEM scratch across the
inner B sweep and are written once per tile), recomputes pe/xj/alpha
from the saved softmax stats, and emits:
  dxj_node  directly (= dxj; the node half is pre-projected outside),
  dq        as per-tile partials (summed by XLA),
  dW1/db1/dLN-g/dLN-b/d(W2@W_fold)/dcbias/datt per tile.
Unfolding (W2, W_fold) and unstacking per-class grads happens in plain
jnp in the wrapper, outside the custom VJP, so autodiff routes them to
the true parameter leaves.

Mosaic notes (see ops/pallas/attention.py): no lane-collapsing reshapes,
no accumulation into output blocks (scratch + final write), 2-D MXU dots
with [bb*ct, O] leading-dim reshapes only.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LN_EPS = 1e-5


def _pe_dir(pf3, pg3, w1a, w1b, b1, g, b, w2, kdt):
    """One symmetric direction of a class PPR encoder, in VMEM.
    pf3/pg3: [bb, ct, 1] first/second MLP input channel.
    Returns (pe [bb*ct, O] f32, and the residuals needed for backward:
    xhat [bb, ct, O], r [bb, ct, 1], h2 [bb*ct, O] in matmul dtype)."""
    bb, ct, _ = pf3.shape
    ho = b1.shape[-1]
    pre = pf3 * w1a + pg3 * w1b + b1[None, None, :]          # [bb, ct, O]
    mu = jnp.mean(pre, axis=-1, keepdims=True)
    xc = pre - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)                          # [bb, ct, 1]
    xhat = xc * r
    y = xhat * g[None, None, :] + b[None, None, :]
    h = jnp.maximum(y, 0.0)
    h2 = h.reshape(bb * ct, ho).astype(kdt)
    pe = jnp.dot(h2, w2, preferred_element_type=jnp.float32)  # [bb*ct, O]
    return pe, xhat, r, h2


def _fwd_kernel(keys_ref, ps_ref, pt_ref, valid_ref, q_ref,
                w1_ref, b1_ref, g_ref, b_ref, w2_ref, cbias_ref, att_ref,
                bias_ref,
                out_ref, m_out_ref, l_out_ref,
                m_ref, l_ref, acc_ref):
    bb, ct, ho = keys_ref.shape
    j = pl.program_id(1)
    n_ct = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full((bb, 128), _NEG / 2, jnp.float32)
        l_ref[:] = jnp.zeros((bb, 128), jnp.float32)
        acc_ref[:] = jnp.zeros((bb, ho), jnp.float32)

    v = valid_ref[:].reshape(bb, ct)

    # Tile gating: context tables are front-compacted per class
    # (ops/context.py:_compact), so at real occupancies (2-30% of the
    # static budgets) most tiles carry NO valid entry. A dead tile is a
    # bit-exact no-op of the online softmax (m1 = max(m0, NEG) = m0,
    # corr = 1, e = 0), so skipping its PE/score compute changes nothing
    # — the tile's DMA still streams, but the kernel is compute-bound.
    @pl.when(jnp.any(v > 0))
    def _():
        # PE hidden dim dh (= model dim) is distinct from the output dim
        # ho (= heads*out; 2*dim for layer 0 of a 2-layer stack)
        dh = w1_ref.shape[-1]
        w1 = w1_ref[:].reshape(2, dh)
        w1a = w1[0:1].reshape(1, 1, dh)
        w1b = w1[1:2].reshape(1, 1, dh)
        b1 = b1_ref[:].reshape(dh)
        g = g_ref[:].reshape(dh)
        b = b_ref[:].reshape(dh)
        w2 = w2_ref[:].reshape(dh, ho)
        kdt = w2.dtype
        # scalar tables ride tile-major as [n_ct, B, ct] so the block's
        # last dim equals the array's (Mosaic lane-divisibility)
        ps3 = ps_ref[:].reshape(bb, ct)[:, :, None]
        pt3 = pt_ref[:].reshape(bb, ct)[:, :, None]

        pe_a, _, _, _ = _pe_dir(ps3, pt3, w1a, w1b, b1, g, b, w2, kdt)
        pe_b, _, _, _ = _pe_dir(pt3, ps3, w1a, w1b, b1, g, b, w2, kdt)

        keys2 = keys_ref[:].reshape(bb * ct, ho).astype(jnp.float32)
        xj = keys2 + pe_a + pe_b + cbias_ref[:].reshape(1, ho)  # [bb*ct, O]

        q = q_ref[:]                                            # [bb, O]
        qb = jnp.repeat(q, ct, axis=0)                          # [bb*ct, O]
        z = xj * qb
        z = jnp.where(z >= 0, z, 0.2 * z)
        zatt = z * att_ref[:].reshape(1, ho)
        logits = jnp.sum(zatt.reshape(bb, ct, ho), axis=-1)     # [bb, ct]
        logits = jnp.where(v > 0, logits, _NEG)

        m0 = m_ref[:][:, :1]
        m1 = jnp.maximum(m0, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m0 - m1)
        e = jnp.exp(logits - m1) * v                            # [bb, ct]
        l0 = l_ref[:][:, :1]
        l_ref[:] = jnp.broadcast_to(
            l0 * corr + jnp.sum(e, axis=1, keepdims=True), (bb, 128)
        )
        wsum = jnp.sum(e[:, :, None] * xj.reshape(bb, ct, ho), axis=1)
        acc_ref[:] = acc_ref[:] * corr + wsum
        m_ref[:] = jnp.broadcast_to(m1, (bb, 128))

    @pl.when(j == n_ct - 1)
    def _():
        denom = jnp.maximum(l_ref[:][:, :1], 1e-16)
        out_ref[:] = acc_ref[:] / denom + bias_ref[:][None]
        m_out_ref[:] = m_ref[:]
        l_out_ref[:] = l_ref[:]


def _fwd_call(keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att, bias,
              block_b, c_tile, interpret):
    bsz, c, ho = keys.shape
    dh = w1.shape[-1]
    grid = (bsz // block_b, c // c_tile)

    def tilemap(i, j):
        return (j, 0, 0)

    def scalmap(i, j):
        return (j, i, 0)

    return pl.pallas_call(
        _fwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, ho), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 128), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 128), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, c_tile, ho), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), scalmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), scalmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), scalmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, ho), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ho), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
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
    )(keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att, bias)


# --------------------------------------------------------------------------
# backward kernel — grid (C-tiles, B-blocks): B is the INNER axis so the
# per-tile weight grads accumulate in scratch over one contiguous sweep
# --------------------------------------------------------------------------

def _dir_bwd(pf3, pg3, xhat, r, h2, b, w2, g, dxj2, dxj2c, kdt):
    """Backward of one symmetric PE direction. All reductions stop at
    [bb, O] (single axis=1 sums — Mosaic rejects chained cross-axis
    reduces); the caller accumulates them in scratch and collapses to
    [1, O] only at the final-write step. The relu mask is recomputed
    from xhat here instead of stored (one less persistent VMEM slot)."""
    bb, ct, _ = pf3.shape
    ho = h2.shape[-1]
    dw2 = jnp.dot(h2.T, dxj2c, preferred_element_type=jnp.float32)
    dh2 = jnp.dot(dxj2c, w2.T, preferred_element_type=jnp.float32)
    ymask = (xhat * g[None, None, :] + b[None, None, :] > 0).astype(
        jnp.float32)
    dy = dh2.reshape(bb, ct, ho) * ymask                       # [bb, ct, O]
    dg = jnp.sum(dy * xhat, axis=1)                            # [bb, O]
    db = jnp.sum(dy, axis=1)
    dxhat = dy * g[None, None, :]
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dpre = r * (dxhat - m1 - xhat * m2)                        # [bb, ct, O]
    db1 = jnp.sum(dpre, axis=1)
    dw1f = jnp.sum(pf3 * dpre, axis=1)
    dw1g = jnp.sum(pg3 * dpre, axis=1)
    return dw2, db1, dg, db, dw1f, dw1g


def _bwd_kernel(keys_ref, ps_ref, pt_ref, valid_ref, q_ref, g_out_ref,
                m_ref, l_ref, delta_ref,
                w1_ref, b1_ref, g_ref, b_ref, w2_ref, cbias_ref, att_ref,
                dkeys_ref, dqp_ref, dpe_ref, dout_ref, dw2_ref,
                db1_s, dg_s, db_s, dcb_s, datt_s, dw1f_s, dw1g_s, dw2_s):
    bb, ct, ho = keys_ref.shape
    dh = w1_ref.shape[-1]
    i = pl.program_id(1)                 # B-block (inner)
    nb = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        for s in (db1_s, dg_s, db_s, dw1f_s, dw1g_s):
            s[:] = jnp.zeros((bb, dh), jnp.float32)
        for s in (dcb_s, datt_s):
            s[:] = jnp.zeros((bb, ho), jnp.float32)
        dw2_s[:] = jnp.zeros((dh, ho), jnp.float32)

    v = valid_ref[:].reshape(bb, ct)
    tile_live = jnp.any(v > 0)

    # dead tile (see the forward kernel's gating note): alpha = 0 and
    # dlogits = 0 identically, so every scratch contribution is an exact
    # zero and the per-(tile, block) outputs are zeros — write them
    # directly and skip the PE recompute + 8 matmuls
    @pl.when(tile_live)
    def _():
        w1 = w1_ref[:].reshape(2, dh)
        w1a = w1[0:1].reshape(1, 1, dh)
        w1b = w1[1:2].reshape(1, 1, dh)
        b1 = b1_ref[:].reshape(dh)
        g = g_ref[:].reshape(dh)
        b = b_ref[:].reshape(dh)
        w2 = w2_ref[:].reshape(dh, ho)
        kdt = w2.dtype
        ps3 = ps_ref[:].reshape(bb, ct)[:, :, None]
        pt3 = pt_ref[:].reshape(bb, ct)[:, :, None]

        pe_a, xhat_a, r_a, h2_a = _pe_dir(
            ps3, pt3, w1a, w1b, b1, g, b, w2, kdt)
        pe_b, xhat_b, r_b, h2_b = _pe_dir(
            pt3, ps3, w1a, w1b, b1, g, b, w2, kdt)

        keys2 = keys_ref[:].reshape(bb * ct, ho).astype(jnp.float32)
        xj2 = keys2 + pe_a + pe_b + cbias_ref[:].reshape(1, ho)
        xj3 = xj2.reshape(bb, ct, ho)

        qb = jnp.repeat(q_ref[:], ct, axis=0)                  # [bb*ct, O]
        pre2 = xj2 * qb
        z2 = jnp.where(pre2 >= 0, pre2, 0.2 * pre2)
        att_row = att_ref[:].reshape(1, ho)
        logits = jnp.sum((z2 * att_row).reshape(bb, ct, ho), axis=-1)
        logits = jnp.where(v > 0, logits, _NEG)

        m = m_ref[:][:, :1]
        l = jnp.maximum(l_ref[:][:, :1], 1e-16)
        alpha = jnp.exp(logits - m) / l * v                    # [bb, ct]

        gb = jnp.repeat(g_out_ref[:], ct, axis=0)              # [bb*ct, O]
        galpha = jnp.sum((gb * xj2).reshape(bb, ct, ho), axis=-1)
        delta = delta_ref[:][:, :1]
        dlogits = alpha * (galpha - delta)                     # [bb, ct]
        dlog3 = dlogits[:, :, None]

        datt_s[:] = datt_s[:] + jnp.sum(
            dlog3 * z2.reshape(bb, ct, ho), axis=1)            # [bb, O]

        sa2 = jnp.where(pre2 >= 0, 1.0, 0.2) * att_row         # [bb*ct, O]
        dpre3 = dlog3 * sa2.reshape(bb, ct, ho)
        axj3 = alpha[:, :, None] * gb.reshape(bb, ct, ho)
        dxj3 = axj3 + dpre3 * qb.reshape(bb, ct, ho)           # [bb, ct, O]
        dxj2 = dxj3.reshape(bb * ct, ho)
        dxj2c = dxj2.astype(kdt)

        # node half: xj = keys + ... so dkeys is dxj directly
        dkeys_ref[:] = dxj3.astype(dkeys_ref.dtype)
        # dq partial for this (tile, B-block); summed over tiles by XLA
        dqp_ref[:] = jnp.sum(dpre3 * xj3, axis=1)              # [bb, O]
        dcb_s[:] = dcb_s[:] + jnp.sum(dxj3, axis=1)

        dw2a, db1a, dga, dba, dw1fa, dw1ga = _dir_bwd(
            ps3, pt3, xhat_a, r_a, h2_a, b, w2, g, dxj2, dxj2c, kdt)
        dw2b, db1b, dgb_, dbb, dw1fb, dw1gb = _dir_bwd(
            pt3, ps3, xhat_b, r_b, h2_b, b, w2, g, dxj2, dxj2c, kdt)

        db1_s[:] = db1_s[:] + db1a + db1b
        dg_s[:] = dg_s[:] + dga + dgb_
        db_s[:] = db_s[:] + dba + dbb
        dw1f_s[:] = dw1f_s[:] + dw1fa + dw1fb
        dw1g_s[:] = dw1g_s[:] + dw1ga + dw1gb
        dw2_s[:] = dw2_s[:] + dw2a + dw2b

    @pl.when(jnp.logical_not(tile_live))
    def _():
        dkeys_ref[:] = jnp.zeros((bb, ct, ho), dkeys_ref.dtype)
        dqp_ref[:] = jnp.zeros((bb, ho), jnp.float32)

    @pl.when(i == nb - 1)
    def _():
        # dpe rows (width dh): 0 db1, 1 dg, 2 db, 3 dw1[0], 4 dw1[1]
        dpe_ref[:] = jnp.concatenate(
            [
                jnp.sum(db1_s[:], axis=0, keepdims=True),
                jnp.sum(dg_s[:], axis=0, keepdims=True),
                jnp.sum(db_s[:], axis=0, keepdims=True),
                jnp.sum(dw1f_s[:], axis=0, keepdims=True),
                jnp.sum(dw1g_s[:], axis=0, keepdims=True),
                jnp.zeros((3, dh), jnp.float32),
            ],
            axis=0,
        )                                                      # [8, dh]
        # dout rows (width ho): 0 dcbias, 1 datt
        dout_ref[:] = jnp.concatenate(
            [
                jnp.sum(dcb_s[:], axis=0, keepdims=True),
                jnp.sum(datt_s[:], axis=0, keepdims=True),
                jnp.zeros((6, ho), jnp.float32),
            ],
            axis=0,
        )                                                      # [8, O]
        dw2_ref[:] = dw2_s[:]


def _bwd_call(keys, ps, pt, valid_f, q, g_out, m, l, delta,
              w1, b1, g, b, w2, cbias, att,
              block_b, c_tile, interpret):
    bsz, c, ho = keys.shape
    dh = w1.shape[-1]
    n_ct = c // c_tile
    grid = (n_ct, bsz // block_b)   # B inner: weight grads sweep scratch

    def tilemap(j, i):
        return (j, 0, 0)

    def bmap2(j, i):
        return (i, 0)

    def bmap3(j, i):
        return (j, i, 0)

    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c, ho), keys.dtype),
            jax.ShapeDtypeStruct((n_ct * bsz, ho), jnp.float32),
            jax.ShapeDtypeStruct((n_ct * 8, dh), jnp.float32),
            jax.ShapeDtypeStruct((n_ct * 8, ho), jnp.float32),
            jax.ShapeDtypeStruct((n_ct * dh, ho), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_b, c_tile, ho), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), bmap3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), bmap3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_b, c_tile), bmap3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dh, ho), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ho), tilemap, memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, c_tile, ho), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # dq partials, flattened 2-D: row-block j * n_b + i
            pl.BlockSpec((block_b, ho),
                         lambda j, i: (j * (bsz // block_b) + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, dh), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ho), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dh, ho), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((block_b, dh), jnp.float32)] * 3
        + [pltpu.VMEM((block_b, ho), jnp.float32)] * 2
        + [pltpu.VMEM((block_b, dh), jnp.float32)] * 2
        + [pltpu.VMEM((dh, ho), jnp.float32)],
        interpret=interpret,
    )(keys, ps, pt, valid_f, q, g_out, m, l, delta,
      w1, b1, g, b, w2, cbias, att)


# --------------------------------------------------------------------------
# custom-VJP wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _fused(keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att, bias,
           block_b, c_tile, interpret):
    out, _, _ = _fwd_call(keys, ps, pt, valid_f, q, w1, b1, g, b, w2,
                          cbias, att, bias, block_b[0], c_tile, interpret)
    return out


def _fused_fwd(keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att, bias,
               block_b, c_tile, interpret):
    out, m, l = _fwd_call(keys, ps, pt, valid_f, q, w1, b1, g, b, w2,
                          cbias, att, bias, block_b[0], c_tile, interpret)
    return out, (keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att,
                 bias, m, l, out)


def _fused_bwd(block_b, c_tile, interpret, res, g_out):
    (keys, ps, pt, valid_f, q, w1, b1, g, b, w2, cbias, att, bias,
     m, l, out) = res
    g_out = g_out.astype(jnp.float32)
    delta = jnp.sum(g_out * (out - bias[None]), axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (delta.shape[0], 128))
    dkeys, dqp, dpe, dout, dw2 = _bwd_call(
        keys, ps, pt, valid_f, q, g_out, m, l, delta,
        w1, b1, g, b, w2, cbias, att, block_b[1], c_tile, interpret,
    )
    n_ct, bsz, ho = ps.shape[0], q.shape[0], q.shape[1]
    dh = w1.shape[-1]
    dq = jnp.sum(dqp.reshape(n_ct, bsz, ho), axis=0)
    dpe = dpe.reshape(n_ct, 8, dh)
    dout = dout.reshape(n_ct, 8, ho)
    dw2 = dw2.reshape(n_ct, dh, ho)
    db1 = dpe[:, 0].reshape(b1.shape)
    dg = dpe[:, 1].reshape(g.shape)
    db = dpe[:, 2].reshape(b.shape)
    dw1 = jnp.stack([dpe[:, 3], dpe[:, 4]], axis=1).reshape(w1.shape)
    dcbias = dout[:, 0].reshape(cbias.shape)
    datt = jnp.sum(dout[:, 1], axis=0).reshape(att.shape)
    dbias = jnp.sum(g_out, axis=0)
    return (dkeys, jnp.zeros_like(ps), jnp.zeros_like(pt),
            jnp.zeros_like(valid_f), dq, dw1, db1, dg, db,
            dw2.astype(w2.dtype), dcbias, datt, dbias)


_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

def pe_attention_tile(budgets, min_tile: int = 32) -> int:
    """Largest C-tile (<= 128) that divides every class budget so each
    tile is single-class; 0 if the budgets don't align (tiles below
    ``min_tile`` rows drown in grid-step overhead, so they're treated as
    unaligned and the caller falls back to the XLA path). Tests pass
    ``min_tile=8`` to exercise small shapes in interpret mode."""
    import math

    t = 0
    for bgt in budgets:
        if bgt:
            t = math.gcd(t, bgt)
    t = math.gcd(t, 128)
    return t if t >= min_tile else 0


@functools.partial(
    jax.jit,
    static_argnames=("c_tile", "tile_classes", "block_b", "interpret"),
)
def fused_pe_link_attention(
    xj_node: jnp.ndarray,   # [B, C, O] gathered X_node @ W_r[:d] rows
    ps: jnp.ndarray,        # [B, C] f32 ppr(src, v)
    pt: jnp.ndarray,        # [B, C] f32 ppr(tgt, v)
    valid: jnp.ndarray,     # [B, C] bool
    q: jnp.ndarray,         # [B, O] lin_l(x_a) + lin_l(x_b)
    w1_cls: jnp.ndarray,    # [K, 2, dh] per-CLASS PPR-encoder layer-1 weights
    b1_cls: jnp.ndarray,    # [K, dh]   (dh = PE hidden dim = model dim;
    g_cls: jnp.ndarray,     # [K, dh]    LayerNorm gain — distinct from the
    b_cls: jnp.ndarray,     # [K, dh]    output dim O = heads*out)
    w2f_cls: jnp.ndarray,   # [K, dh, O] folded W2_c @ W_r[d:]
    cbias_cls: jnp.ndarray,  # [K, O]  folded 2*b2_c @ W_r[d:] + lin_r bias
    att: jnp.ndarray,       # [H=1, O]
    bias: jnp.ndarray,      # [O] output bias
    *,
    c_tile: int,
    tile_classes: tuple,    # class index of each C-tile (len == C/c_tile)
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused PE + per-link attention (module docstring).
    Class weights are expanded to per-tile stacks here, in plain jnp, so
    their grads flow back to the class leaves through the VJP of stack."""
    bsz, c, ho = xj_node.shape
    n_ct = len(tile_classes)
    assert c == c_tile * n_ct
    sel = jnp.asarray(tile_classes, jnp.int32)
    w1 = w1_cls[sel]                         # [T, 2, O]
    b1 = b1_cls[sel][:, None, :]             # [T, 1, O]
    g = g_cls[sel][:, None, :]
    b = b_cls[sel][:, None, :]
    w2 = w2f_cls[sel]                        # [T, O, O]
    cbias = cbias_cls[sel][:, None, :]

    def tile_major(x):
        # [B, C] -> [n_ct, B, c_tile]: the block's last dim equals the
        # array's, satisfying Mosaic's lane-divisibility constraint
        return x.reshape(bsz, n_ct, c_tile).swapaxes(0, 1)

    kdt = jnp.bfloat16 if xj_node.dtype == jnp.bfloat16 else jnp.float32

    # VMEM stack model: live [bb*ct, O] f32 temps, with the lane dim
    # PADDED to 128 in VMEM (a [*, 64] f32 slot costs as much as
    # [*, 128] — measured via a 17.0M scoped-vmem OOM at dim 64).
    # Calibrated slot counts: ~12 live in the forward, ~17 in the
    # backward (collab bb_bwd=32 OOMs at 16.3M, 16 fits; citation2-like
    # bb_bwd=64 OOMs at 17.0M, 32 fits; ddi bb_bwd=8 fits).
    lane = -(-ho // 128) * 128

    def fit(bb, n_slots, budget_mb):
        while bb > 1 and bb * c_tile * lane * 4 * n_slots > budget_mb << 20:
            bb //= 2
        while bsz % bb != 0 and bb > 1:
            bb //= 2
        return max(bb, 1)

    if block_b <= 0:
        bb_fwd = fit(64, 12, 13)
        bb_bwd = fit(64, 17, 15)
    else:
        bb_fwd = bb_bwd = block_b

    return _fused(
        xj_node.astype(kdt),
        tile_major(ps.astype(jnp.float32)),
        tile_major(pt.astype(jnp.float32)),
        tile_major(valid.astype(jnp.float32)),
        q.astype(jnp.float32),
        w1.astype(jnp.float32), b1.astype(jnp.float32),
        g.astype(jnp.float32), b.astype(jnp.float32),
        w2.astype(kdt), cbias.astype(jnp.float32),
        att.astype(jnp.float32), bias.astype(jnp.float32),
        (bb_fwd, bb_bwd), c_tile, interpret,
    )
