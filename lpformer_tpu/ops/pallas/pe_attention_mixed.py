"""Fused PE + per-link attention over the COMBINED (class-tagged)
context table (ContextConfig.budget_combined).

Same math as ops/pallas/pe_attention.py (reference semantics:
src/models/link_transformer.py:132-211 + src/modules/layers.py:193-224),
but slots carry a per-slot node CLASS instead of living in per-class
blocks, so one tile mixes classes. Per-slot class selection runs on the
MXU as tiny one-hot lane dots:

  * layer-1 of the class PPR MLP: pre = in1 @ W1cat where
    in1 = [pf·sel_0..sel_{K-1} | pg·sel_* | sel_*]   ([bb*ct, 3K]) and
    W1cat stacks (w1a_k, w1b_k, b1_k) rows            ([3K, dh])
  * LayerNorm gain/bias per slot: g_s = oh @ g_stack  ([bb*ct, K] @ [K, dh])
  * layer-2: pe = Σ_k (h · sel_k) @ W2_k  (K dots — K-fold layer-2 flops,
    but the combined table is sized to the TOTAL-count tail, typically
    ≤ 1/2 of the stacked per-class budgets, so net flops shrink)
  * class bias per slot: cb_s = oh @ cbias_stack

The backward exploits the same trick in reverse: every per-class weight
grad is an ``ohᵀ @ (elementwise)`` or ``(h·sel_k)ᵀ @ dxj`` dot that
reduces over the batch axis inside the MXU, so the weight-grad scratch
is [K(*dh), ·] — no per-B-block accumulators, and grads accumulate
across the ENTIRE grid with one final write.

Mosaic notes as in pe_attention.py: no lane-collapsing reshapes, 2-D
dots with [bb*ct, ·] leading dims, scratch + final write (no
accumulation into output blocks).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30
_LN_EPS = 1e-5


# Mosaic-safety note: the per-slot one-hot is built in 3-D by comparing
# cls[:, :, None] against an INT broadcasted_iota along a new trailing
# axis, then reshaped with a leading-dim collapse only. A direct
# ``[bb, ct] -> [bb*ct, 1]`` reshape is a lane-collapsing shape cast
# Mosaic rejects ("infer-vector-layout: unsupported shape cast"), and
# tpu.iota must produce integers.


def _pe_dir_mixed(in1, oh3, g_s, b_s, w1cat, w2_ref, K, bb, ct, dh, kdt):
    """One symmetric direction with per-slot class weights.
    in1 [bb*ct, 3K]; oh3 [bb, ct, K] one-hot; g_s/b_s [bb*ct, dh]
    (pre-looked-up per slot). Returns (pe [bb*ct, O] f32, residuals
    (xhat [bb*ct, dh], r [bb*ct, 1], h [bb*ct, dh])).

    The per-class masking of h broadcasts a [bb, ct, 1] slice of oh3 in
    3-D (the classic kernel's pattern) — broadcasting a 1-lane column of
    the FLAT [bb*ct, K] one-hot trips a Mosaic relayout bug ("Invalid
    relayout: non-singleton logical dimension is replicated...")."""
    pre = jnp.dot(in1, w1cat, preferred_element_type=jnp.float32)
    mu = jnp.mean(pre, axis=-1, keepdims=True)
    xc = pre - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _LN_EPS)
    xhat = xc * r                                       # [bb*ct, dh]
    y = xhat * g_s + b_s
    h = jnp.maximum(y, 0.0)
    ho = w2_ref.shape[-1]
    h3 = h.reshape(bb, ct, dh)
    pe = jnp.zeros((bb * ct, ho), jnp.float32)
    for k in range(K):
        hk = (h3 * oh3[:, :, k:k + 1]).reshape(bb * ct, dh).astype(kdt)
        pe = pe + jnp.dot(hk, w2_ref[k], preferred_element_type=jnp.float32)
    return pe, xhat, r, h


def _fwd_kernel(keys_ref, ps_ref, pt_ref, valid_ref, cls_ref, q_ref,
                w1cat_ref, g_ref, b_ref, w2_ref, cbias_ref, att_ref,
                bias_ref,
                out_ref, m_out_ref, l_out_ref,
                m_ref, l_ref, acc_ref):
    bb, ct, ho = keys_ref.shape
    K = g_ref.shape[0]
    dh = g_ref.shape[-1]
    j = pl.program_id(1)
    n_ct = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full((bb, 128), _NEG / 2, jnp.float32)
        l_ref[:] = jnp.zeros((bb, 128), jnp.float32)
        acc_ref[:] = jnp.zeros((bb, ho), jnp.float32)

    v = valid_ref[:].reshape(bb, ct)

    # dead-tile gating (see pe_attention.py): front-compacted tables
    # leave most tiles with no valid entry; skipping them is a bit-exact
    # no-op of the online softmax
    @pl.when(jnp.any(v > 0))
    def _():
        kdt = w2_ref.dtype
        cls2 = cls_ref[:].reshape(bb, ct)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ct, K), 2)
        oh3 = (cls2.astype(jnp.int32)[:, :, None] == k_iota).astype(
            jnp.float32)
        oh = oh3.reshape(bb * ct, K)                        # leading collapse
        pf3 = ps_ref[:].reshape(bb, ct)[:, :, None]
        pg3 = pt_ref[:].reshape(bb, ct)[:, :, None]
        in1_a = jnp.concatenate(
            [pf3 * oh3, pg3 * oh3, oh3], axis=2).reshape(bb * ct, 3 * K)
        in1_b = jnp.concatenate(
            [pg3 * oh3, pf3 * oh3, oh3], axis=2).reshape(bb * ct, 3 * K)
        w1cat = w1cat_ref[:]                                # [3K, dh]
        g_s = jnp.dot(oh, g_ref[:], preferred_element_type=jnp.float32)
        b_s = jnp.dot(oh, b_ref[:], preferred_element_type=jnp.float32)
        cb_s = jnp.dot(oh, cbias_ref[:],
                       preferred_element_type=jnp.float32)  # [bb*ct, O]

        pe_a, _, _, _ = _pe_dir_mixed(
            in1_a, oh3, g_s, b_s, w1cat, w2_ref, K, bb, ct, dh, kdt)
        pe_b, _, _, _ = _pe_dir_mixed(
            in1_b, oh3, g_s, b_s, w1cat, w2_ref, K, bb, ct, dh, kdt)

        keys2 = keys_ref[:].reshape(bb * ct, ho).astype(jnp.float32)
        xj = keys2 + pe_a + pe_b + cb_s                     # [bb*ct, O]

        q = q_ref[:]                                        # [bb, O]
        qb = jnp.repeat(q, ct, axis=0)
        z = xj * qb
        z = jnp.where(z >= 0, z, 0.2 * z)
        zatt = z * att_ref[:].reshape(1, ho)
        logits = jnp.sum(zatt.reshape(bb, ct, ho), axis=-1)
        logits = jnp.where(v > 0, logits, _NEG)

        m0 = m_ref[:][:, :1]
        m1 = jnp.maximum(m0, jnp.max(logits, axis=1, keepdims=True))
        corr = jnp.exp(m0 - m1)
        e = jnp.exp(logits - m1) * v
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


def _fwd_call(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias, att,
              bias, block_b, c_tile, interpret):
    bsz, c, ho = keys.shape
    K, dh = g.shape
    grid = (bsz // block_b, c // c_tile)

    def whole(i, j):
        return (0, 0)

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
            pl.BlockSpec((1, block_b, c_tile), scalmap,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh, ho), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ho), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]), whole,
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
    )(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias, att, bias)


# --------------------------------------------------------------------------
# backward kernel — weight grads reduce over the batch axis INSIDE the MXU
# (ohᵀ @ elementwise dots), so scratch holds [K(*dh), ·] accumulators that
# survive the whole grid and are written once at the last step
# --------------------------------------------------------------------------

def _dir_bwd_mixed(in1, oh, oh3, xhat, r, h, g_s, b_s, w2_ref, dxj2,
                   dxj2c, K, bb, ct, dh, kdt,
                   dw1cat_s, dg_s, db_s, dw2_s):
    ho = dxj2.shape[-1]
    h3 = h.reshape(bb, ct, dh)
    dh_acc3 = jnp.zeros((bb, ct, dh), jnp.float32)
    for k in range(K):
        ohk3 = oh3[:, :, k:k + 1]
        hk = (h3 * ohk3).reshape(bb * ct, dh).astype(kdt)
        dw2_s[k] = dw2_s[k] + jnp.dot(
            hk.T, dxj2c, preferred_element_type=jnp.float32)
        dhk = jnp.dot(dxj2c, w2_ref[k].T,
                      preferred_element_type=jnp.float32)
        dh_acc3 = dh_acc3 + dhk.reshape(bb, ct, dh) * ohk3
    dh_acc = dh_acc3.reshape(bb * ct, dh)
    ymask = (xhat * g_s + b_s > 0).astype(jnp.float32)
    dy = dh_acc * ymask                                   # [bb*ct, dh]
    dg_s[:] = dg_s[:] + jnp.dot(
        oh.T, dy * xhat, preferred_element_type=jnp.float32)
    db_s[:] = db_s[:] + jnp.dot(
        oh.T, dy, preferred_element_type=jnp.float32)
    dxhat = dy * g_s
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dpre = r * (dxhat - m1 - xhat * m2)                   # [bb*ct, dh]
    dw1cat_s[:] = dw1cat_s[:] + jnp.dot(
        in1.T, dpre, preferred_element_type=jnp.float32)


def _bwd_kernel(keys_ref, ps_ref, pt_ref, valid_ref, cls_ref, q_ref,
                g_out_ref, m_ref, l_ref, delta_ref,
                w1cat_ref, g_ref, b_ref, w2_ref, cbias_ref, att_ref,
                dkeys_ref, dqp_ref, dw1cat_ref, dg_ref, db_ref, dcb_ref,
                datt_ref, dw2_ref,
                dw1cat_s, dg_s, db_s, dcb_s, datt_s, dw2_s):
    bb, ct, ho = keys_ref.shape
    K = g_ref.shape[0]
    dh = g_ref.shape[-1]
    j = pl.program_id(0)
    i = pl.program_id(1)
    n_ct = pl.num_programs(0)
    nb = pl.num_programs(1)

    @pl.when((j == 0) & (i == 0))
    def _():
        dw1cat_s[:] = jnp.zeros((3 * K, dh), jnp.float32)
        dg_s[:] = jnp.zeros((K, dh), jnp.float32)
        db_s[:] = jnp.zeros((K, dh), jnp.float32)
        dcb_s[:] = jnp.zeros((K, ho), jnp.float32)
        datt_s[:] = jnp.zeros((bb, ho), jnp.float32)
        dw2_s[:] = jnp.zeros((K, dh, ho), jnp.float32)

    v = valid_ref[:].reshape(bb, ct)
    tile_live = jnp.any(v > 0)

    @pl.when(tile_live)
    def _():
        kdt = w2_ref.dtype
        cls2 = cls_ref[:].reshape(bb, ct)
        k_iota = jax.lax.broadcasted_iota(jnp.int32, (bb, ct, K), 2)
        oh3 = (cls2.astype(jnp.int32)[:, :, None] == k_iota).astype(
            jnp.float32)
        oh = oh3.reshape(bb * ct, K)
        pf3 = ps_ref[:].reshape(bb, ct)[:, :, None]
        pg3 = pt_ref[:].reshape(bb, ct)[:, :, None]
        in1_a = jnp.concatenate(
            [pf3 * oh3, pg3 * oh3, oh3], axis=2).reshape(bb * ct, 3 * K)
        in1_b = jnp.concatenate(
            [pg3 * oh3, pf3 * oh3, oh3], axis=2).reshape(bb * ct, 3 * K)
        w1cat = w1cat_ref[:]
        g_s = jnp.dot(oh, g_ref[:], preferred_element_type=jnp.float32)
        b_s = jnp.dot(oh, b_ref[:], preferred_element_type=jnp.float32)
        cb_s = jnp.dot(oh, cbias_ref[:],
                       preferred_element_type=jnp.float32)

        pe_a, xhat_a, r_a, h_a = _pe_dir_mixed(
            in1_a, oh3, g_s, b_s, w1cat, w2_ref, K, bb, ct, dh, kdt)
        pe_b, xhat_b, r_b, h_b = _pe_dir_mixed(
            in1_b, oh3, g_s, b_s, w1cat, w2_ref, K, bb, ct, dh, kdt)

        keys2 = keys_ref[:].reshape(bb * ct, ho).astype(jnp.float32)
        xj2 = keys2 + pe_a + pe_b + cb_s
        xj3 = xj2.reshape(bb, ct, ho)

        qb = jnp.repeat(q_ref[:], ct, axis=0)
        pre2 = xj2 * qb
        z2 = jnp.where(pre2 >= 0, pre2, 0.2 * pre2)
        att_row = att_ref[:].reshape(1, ho)
        logits = jnp.sum((z2 * att_row).reshape(bb, ct, ho), axis=-1)
        logits = jnp.where(v > 0, logits, _NEG)

        m = m_ref[:][:, :1]
        l = jnp.maximum(l_ref[:][:, :1], 1e-16)
        alpha = jnp.exp(logits - m) / l * v                # [bb, ct]

        gb = jnp.repeat(g_out_ref[:], ct, axis=0)
        galpha = jnp.sum((gb * xj2).reshape(bb, ct, ho), axis=-1)
        delta = delta_ref[:][:, :1]
        dlogits = alpha * (galpha - delta)                  # [bb, ct]
        dlog3 = dlogits[:, :, None]

        # datt: accumulate the [bb, O] per-block partial in scratch and
        # collapse to one row only at the final write — an immediate
        # axis-0 reduce of the axis-1 sum hits a Mosaic implicit-dim
        # relayout error ("non-singleton logical dimension is
        # replicated in destination but not in source")
        datt_s[:] = datt_s[:] + jnp.sum(dlog3 * z2.reshape(bb, ct, ho),
                                        axis=1)

        sa2 = jnp.where(pre2 >= 0, 1.0, 0.2) * att_row
        dpre3 = dlog3 * sa2.reshape(bb, ct, ho)
        axj3 = alpha[:, :, None] * gb.reshape(bb, ct, ho)
        dxj3 = axj3 + dpre3 * qb.reshape(bb, ct, ho)        # [bb, ct, O]
        dxj2 = dxj3.reshape(bb * ct, ho)
        dxj2c = dxj2.astype(kdt)

        dkeys_ref[:] = dxj3.astype(dkeys_ref.dtype)
        dqp_ref[:] = jnp.sum(dpre3 * xj3, axis=1)
        dcb_s[:] = dcb_s[:] + jnp.dot(
            oh.T, dxj2, preferred_element_type=jnp.float32)

        _dir_bwd_mixed(in1_a, oh, oh3, xhat_a, r_a, h_a, g_s, b_s,
                       w2_ref, dxj2, dxj2c, K, bb, ct, dh, kdt,
                       dw1cat_s, dg_s, db_s, dw2_s)
        _dir_bwd_mixed(in1_b, oh, oh3, xhat_b, r_b, h_b, g_s, b_s,
                       w2_ref, dxj2, dxj2c, K, bb, ct, dh, kdt,
                       dw1cat_s, dg_s, db_s, dw2_s)

    @pl.when(jnp.logical_not(tile_live))
    def _():
        dkeys_ref[:] = jnp.zeros((bb, ct, ho), dkeys_ref.dtype)
        dqp_ref[:] = jnp.zeros((bb, ho), jnp.float32)

    @pl.when((j == n_ct - 1) & (i == nb - 1))
    def _():
        dw1cat_ref[:] = dw1cat_s[:]
        dg_ref[:] = dg_s[:]
        db_ref[:] = db_s[:]
        dcb_ref[:] = dcb_s[:]
        datt_ref[:] = jnp.concatenate(
            [jnp.sum(datt_s[:], axis=0, keepdims=True),
             jnp.zeros((7, ho), jnp.float32)], axis=0)
        dw2_ref[:] = dw2_s[:]


def _bwd_call(keys, ps, pt, valid_f, clsf, q, g_out, m, l, delta,
              w1cat, g, b, w2, cbias, att,
              block_b, c_tile, interpret):
    bsz, c, ho = keys.shape
    K, dh = g.shape
    n_ct = c // c_tile
    grid = (n_ct, bsz // block_b)

    def whole(j, i):
        return (0, 0)

    def bmap2(j, i):
        return (i, 0)

    def bmap3(j, i):
        return (j, i, 0)

    return pl.pallas_call(
        _bwd_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c, ho), keys.dtype),
            jax.ShapeDtypeStruct((n_ct * bsz, ho), jnp.float32),
            jax.ShapeDtypeStruct((3 * K, dh), jnp.float32),
            jax.ShapeDtypeStruct((K, dh), jnp.float32),
            jax.ShapeDtypeStruct((K, dh), jnp.float32),
            jax.ShapeDtypeStruct((K, ho), jnp.float32),
            jax.ShapeDtypeStruct((8, ho), jnp.float32),
            jax.ShapeDtypeStruct((K, dh, ho), jnp.float32),
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
            pl.BlockSpec((1, block_b, c_tile), bmap3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 128), bmap2, memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh, ho), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ho), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((att.shape[0], att.shape[1]), whole,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((block_b, c_tile, ho), lambda j, i: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, ho),
                         lambda j, i: (j * (bsz // block_b) + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, ho), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((8, ho), whole, memory_space=pltpu.VMEM),
            pl.BlockSpec((K, dh, ho), lambda j, i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((3 * K, dh), jnp.float32),
            pltpu.VMEM((K, dh), jnp.float32),
            pltpu.VMEM((K, dh), jnp.float32),
            pltpu.VMEM((K, ho), jnp.float32),
            pltpu.VMEM((block_b, ho), jnp.float32),
            pltpu.VMEM((K, dh, ho), jnp.float32),
        ],
        interpret=interpret,
    )(keys, ps, pt, valid_f, clsf, q, g_out, m, l, delta,
      w1cat, g, b, w2, cbias, att)


# --------------------------------------------------------------------------
# custom-VJP wrapper
# --------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15))
def _fused(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias, att,
           bias, block_b, c_tile, interpret):
    out, _, _ = _fwd_call(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2,
                          cbias, att, bias, block_b[0], c_tile, interpret)
    return out


def _fused_fwd(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias,
               att, bias, block_b, c_tile, interpret):
    out, m, l = _fwd_call(keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2,
                          cbias, att, bias, block_b[0], c_tile, interpret)
    return out, (keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias,
                 att, bias, m, l, out)


def _fused_bwd(block_b, c_tile, interpret, res, g_out):
    (keys, ps, pt, valid_f, clsf, q, w1cat, g, b, w2, cbias, att, bias,
     m, l, out) = res
    g_out = g_out.astype(jnp.float32)
    delta = jnp.sum(g_out * (out - bias[None]), axis=-1, keepdims=True)
    delta = jnp.broadcast_to(delta, (delta.shape[0], 128))
    dkeys, dqp, dw1cat, dg, db, dcb, datt8, dw2 = _bwd_call(
        keys, ps, pt, valid_f, clsf, q, g_out, m, l, delta,
        w1cat, g, b, w2, cbias, att, block_b[1], c_tile, interpret,
    )
    n_ct = ps.shape[0]
    bsz, ho = q.shape
    dq = jnp.sum(dqp.reshape(n_ct, bsz, ho), axis=0)
    datt = datt8[0:1].reshape(att.shape)
    dbias = jnp.sum(g_out, axis=0)
    return (dkeys, jnp.zeros_like(ps), jnp.zeros_like(pt),
            jnp.zeros_like(valid_f), jnp.zeros_like(clsf), dq,
            dw1cat, dg, db, dw2.astype(w2.dtype), dcb, datt, dbias)


_fused.defvjp(_fused_fwd, _fused_bwd)


# --------------------------------------------------------------------------
# public entry
# --------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("c_tile", "block_b", "interpret"),
)
def fused_pe_link_attention_mixed(
    xj_node: jnp.ndarray,   # [B, C, O] gathered X_node @ W_r[:d] rows
    ps: jnp.ndarray,        # [B, C] f32 ppr(src, v)
    pt: jnp.ndarray,        # [B, C] f32 ppr(tgt, v)
    valid: jnp.ndarray,     # [B, C] bool
    ecls: jnp.ndarray,      # [B, C] int32 encoder index (0..K-1)
    q: jnp.ndarray,         # [B, O] lin_l(x_a) + lin_l(x_b)
    w1_cls: jnp.ndarray,    # [K, 2, dh] per-class PPR-encoder layer-1 W
    b1_cls: jnp.ndarray,    # [K, dh]
    g_cls: jnp.ndarray,     # [K, dh]
    b_cls: jnp.ndarray,     # [K, dh]
    w2f_cls: jnp.ndarray,   # [K, dh, O] folded W2_c @ W_r[d:]
    cbias_cls: jnp.ndarray,  # [K, O] folded 2*b2_c @ W_r[d:] + lin_r bias
    att: jnp.ndarray,       # [H=1, O]
    bias: jnp.ndarray,      # [O]
    *,
    c_tile: int,
    block_b: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable fused PE + attention over the combined class-tagged
    table. ``w1cat`` packs (w1a_k | w1b_k | b1_k) rows so layer 1 is one
    [bb*ct, 3K] @ [3K, dh] dot; its grad splits back to the class leaves
    here, in plain jnp, inside autodiff's view."""
    bsz, c, ho = xj_node.shape
    K, _, dh = w1_cls.shape
    assert c % c_tile == 0
    # rows: w1a_0..w1a_{K-1}, w1b_0.., b1_0..
    w1cat = jnp.concatenate(
        [w1_cls[:, 0, :], w1_cls[:, 1, :], b1_cls], axis=0)  # [3K, dh]

    def tile_major(x):
        n_ct = c // c_tile
        return x.reshape(bsz, n_ct, c_tile).swapaxes(0, 1)

    kdt = jnp.bfloat16 if xj_node.dtype == jnp.bfloat16 else jnp.float32

    lane = -(-ho // 128) * 128

    def fit(bb, n_slots, budget_mb):
        while bb > 1 and bb * c_tile * lane * 4 * n_slots > budget_mb << 20:
            bb //= 2
        while bsz % bb != 0 and bb > 1:
            bb //= 2
        return max(bb, 1)

    if block_b <= 0:
        # mixed kernel holds ~2 extra [bb*ct, dh] temps per direction
        # (per-slot LN gain/bias) vs the blocked kernel
        bb_fwd = fit(64, 14, 13)
        bb_bwd = fit(64, 20, 15)
    else:
        bb_fwd = bb_bwd = block_b

    return _fused(
        xj_node.astype(kdt),
        tile_major(ps.astype(jnp.float32)),
        tile_major(pt.astype(jnp.float32)),
        tile_major(valid.astype(jnp.float32)),
        tile_major(ecls.astype(jnp.float32)),
        q.astype(jnp.float32),
        w1cat.astype(jnp.float32),
        g_cls.astype(jnp.float32), b_cls.astype(jnp.float32),
        w2f_cls.astype(kdt), cbias_cls.astype(jnp.float32),
        att.astype(jnp.float32), bias.astype(jnp.float32),
        (bb_fwd, bb_bwd), c_tile, interpret,
    )
