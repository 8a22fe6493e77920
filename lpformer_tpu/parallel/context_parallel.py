"""Context-parallel per-link attention: the context axis sharded over the
'graph' mesh axis with a two-pass merged softmax.

The structural analog of sequence parallelism / ring attention for this
model (SURVEY §2.4, §5 "long-context"): a link's context set — the
"sequence" — is split across chips; each chip computes flash-style
partial softmax statistics (max, denominator, weighted sum) over its
C-slice, and the exact global softmax is recovered with a
pmax + two psums (log-sum-exp merge). No [B, C, dim] tensor ever exists
on one chip — per-chip context memory is 1/g of the dense path.

Use when per-link context budgets exceed what one chip's attention
working set can hold (ogbl-ppa high-eps PPR selections,
reference: src/models/link_transformer.py:434-481 selects unbounded
sets). For batch-shardable workloads, batch parallelism moves the same
total memory; context parallelism is the axis that still works when a
SINGLE link's context must span chips.

Exactness: softmax is associative under (m, l, acc) merging —
  m = max_k m_k;  l = Σ_k l_k·e^{m_k−m};  acc = Σ_k acc_k·e^{m_k−m}
so the result is bit-for-bit the same math as the dense masked softmax
up to float reassociation (partition-invariance tested in
tests/test_context_parallel.py).

Slicing is per class block (CN / 1-hop / >1-hop keep their separate PPR
encoders, reference: link_transformer.py:182-211): every class budget
must divide by the axis size so each device takes a static-size slice of
each block.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.nn import core as nn
from lpformer_tpu.ops.context import ContextTables
from lpformer_tpu.ops.gather import gather_rows

_NEG = -1e30


def _class_blocks(cfg: LPFormerConfig):
    """(offset, size, encoder-name) per active node class. In combined
    (class-tagged) mode there is ONE mixed block; its encoder is chosen
    per slot (name None)."""
    c = cfg.context
    if c.budget_combined is not None:
        return [(0, c.budget_combined, None)]
    blocks = [(0, c.budget_cn, "ppr_encoder_cn")]
    ofs = c.budget_cn
    if cfg.mask_mode != "cn":
        blocks.append((ofs, c.budget_onehop, "ppr_encoder_onehop"))
        ofs += c.budget_onehop
    if cfg.mask_mode == "all":
        blocks.append((ofs, c.budget_non1hop, "ppr_encoder_non1hop"))
    return blocks


def check_cp_budgets(cfg: LPFormerConfig, g: int) -> None:
    for ofs, size, name in _class_blocks(cfg):
        if size % g != 0:
            raise ValueError(
                f"context-parallel axis size {g} must divide every class "
                f"budget; {name or 'combined'} block has budget {size}"
            )


def _slice_blocks(arr, cfg: LPFormerConfig, g: int, k):
    """Device k's slice of each class block, concatenated: [B, C/g, ...]."""
    parts = []
    for ofs, size, _ in _class_blocks(cfg):
        s = size // g
        parts.append(
            jax.lax.dynamic_slice_in_dim(arr, ofs + k * s, s, axis=1)
        )
    return jnp.concatenate(parts, axis=1)


def _pos_encodings_sliced(
    params: Dict, cfg: LPFormerConfig, ctx: ContextTables, g: int, k
) -> jnp.ndarray:
    """Symmetrized PPR encodings for this device's block slices
    (reference: link_transformer.py:182-211): each slice stays inside one
    class block, so the per-class MLP is statically known."""
    def sym(mlp_p, ps, pt):
        a = nn.mlp_apply(mlp_p, jnp.stack([ps, pt], axis=-1),
                         mm_dtype=cfg.mm_dtype)
        b = nn.mlp_apply(mlp_p, jnp.stack([pt, ps], axis=-1),
                         mm_dtype=cfg.mm_dtype)
        return a + b

    out = []
    for ofs, size, name in _class_blocks(cfg):
        s = size // g
        ps = jax.lax.dynamic_slice_in_dim(
            ctx.src_ppr, ofs + k * s, s, axis=1)
        pt = jax.lax.dynamic_slice_in_dim(
            ctx.tgt_ppr, ofs + k * s, s, axis=1)
        if name is None:
            # combined mixed-class slice: every active encoder runs on
            # the slice, the per-slot class selects
            from lpformer_tpu.models.link_transformer import _encoder_codes

            cls = jax.lax.dynamic_slice_in_dim(
                ctx.cls, ofs + k * s, s, axis=1)
            acc = None
            for ename, code in _encoder_codes(cfg):
                pe = sym(params[ename], ps, pt)
                m = (cls == code).astype(pe.dtype)[..., None]
                acc = pe * m if acc is None else acc + pe * m
            out.append(acc)
        else:
            out.append(sym(params[name], ps, pt))
    return jnp.concatenate(out, axis=1)


def _att_layer_cp(
    lp: Dict,
    cfg: LPFormerConfig,
    edge_x: jnp.ndarray,      # [B, 2*q]   replicated over the cp axis
    keys_in: jnp.ndarray,     # [B, Cg, 2*dim] THIS DEVICE'S context slice
    valid: jnp.ndarray,       # [B, Cg]
    axis: str,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """One GATv2-style attention layer with the context axis sharded over
    ``axis`` (reference: src/modules/layers.py:193-224). The rng must be
    identical on every device along ``axis``."""
    h = cfg.num_heads
    b_, cg_, _ = keys_in.shape
    half = edge_x.shape[-1] // 2
    ho = lp["lin_l"]["w"].shape[1]
    o = ho // h
    e1 = nn.linear_apply(lp["lin_l"], edge_x[:, :half], cfg.mm_dtype)
    e2 = nn.linear_apply(lp["lin_l"], edge_x[:, half:], cfg.mm_dtype)

    xj = nn.linear_apply(lp["lin_r"], keys_in, cfg.mm_dtype)
    xj = xj.reshape(b_, cg_, h, o)
    q = (e1 + e2).reshape(b_, 1, h, o)
    z = jax.nn.leaky_relu(xj * q, negative_slope=0.2)
    logits = jnp.sum(z * lp["att"][None, None], axis=-1)       # [B, Cg, H]
    v = valid[:, :, None]
    logits = jnp.where(v, logits, _NEG)

    # two-pass merged softmax over the cp axis. The shift m cancels out
    # of softmax analytically, so detaching it is exact — and pmax has no
    # differentiation rule anyway.
    m_loc = jnp.max(logits, axis=1, keepdims=True)             # [B, 1, H]
    m = jax.lax.pmax(jax.lax.stop_gradient(m_loc), axis)
    m = jnp.maximum(m, _NEG / 2)
    e = jnp.exp(logits - m) * v.astype(logits.dtype)           # [B, Cg, H]
    l = jax.lax.psum(jnp.sum(e, axis=1, keepdims=True), axis)  # [B, 1, H]
    acc = jax.lax.psum(jnp.sum(e[..., None] * xj, axis=1), axis)  # [B,H,O]
    out = acc / jnp.maximum(l.reshape(b_, h, 1), 1e-16)
    out = out.reshape(b_, h * o) + lp["bias"]
    out = nn.layer_norm_apply(lp["post_norm"], out)
    if train and cfg.dropout > 0 and rng is not None:
        out = nn.dropout(rng, out, cfg.dropout, train)
    return out


def cp_calc_pairwise(
    params: Dict,
    cfg: LPFormerConfig,
    X_full: jnp.ndarray,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    ctx: ContextTables,
    axis: str = "graph",
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
):
    """Pairwise term with the context axis sharded over mesh axis
    ``axis`` (drop-in for models.link_transformer.calc_pairwise inside a
    shard_map; reference: link_transformer.py:132-178).

    ``ctx`` holds the FULL [B, C] tables, identical on every device along
    ``axis`` (ids + ppr scalars — cheap); only the dim-wide tensors
    (gathered node features, positional encodings, attention transients)
    are sliced, which is where the memory lives. ``rng`` must also be
    identical along ``axis``.
    """
    g = jax.lax.axis_size(axis)
    k = jax.lax.axis_index(axis)

    pairwise_feats = jnp.concatenate(
        [gather_rows(X_full, src), gather_rows(X_full, tgt)], axis=-1
    )

    X_ext = jnp.concatenate(
        [X_full, jnp.zeros((1, X_full.shape[-1]), X_full.dtype)], axis=0
    )
    ids_loc = _slice_blocks(ctx.ids, cfg, g, k)
    valid_loc = _slice_blocks(ctx.valid, cfg, g, k)
    node_keys = gather_rows(X_ext, ids_loc)                 # [B, C/g, dim]
    pes = _pos_encodings_sliced(params, cfg, ctx, g, k)     # [B, C/g, dim]
    keys_in = jnp.concatenate([node_keys, pes], axis=-1)

    out = pairwise_feats
    for i, lp in enumerate(params["att_layers"]):
        r = None if rng is None else jax.random.fold_in(rng, 10 + i)
        out = _att_layer_cp(
            lp, cfg, out, keys_in, valid_loc, axis, rng=r, train=train,
        )

    counts = ctx.counts
    if cfg.mask_mode == "cn":
        cnt = counts[:, 0:1]
    elif cfg.mask_mode == "1-hop":
        cnt = jnp.concatenate(
            [counts[:, 0:1], counts[:, 1:2], counts[:, 3:4]], axis=-1
        )
    else:
        cnt = counts
    out = jnp.concatenate([out, cnt], axis=-1)
    return nn.mlp_apply(params["pairwise_lin"], out, mm_dtype=cfg.mm_dtype)
