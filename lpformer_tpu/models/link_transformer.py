"""LPFormer-style adaptive graph transformer for link prediction, TPU-native.

Functional re-implementation of the reference model
(reference: src/models/link_transformer.py:16-481 and
src/modules/layers.py:17-224) over static padded context tables:

  h(a, b) = [ MLP(x_a ⊙ x_b)  ‖  pairwise(a, b) ]            (:82-107)
  pairwise = MLP( attention over context nodes ‖ counts )    (:132-178)

The per-link attention is GATv2-style over each link's context node set
(CNs / 1-hop / >1-hop selected by PPR thresholds), with symmetrized PPR
positional encodings per node class (:182-211). Here it runs as a *dense
masked* attention over the fixed-shape [B, C] context tables — pure
MXU/VPU work with no scatter in the hot loop.

Parameters are plain nested dicts (pytrees); all applies are pure.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lpformer_tpu.graph.containers import GraphBundle
from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.models.gcn import gcn_apply, gcn_init
from lpformer_tpu.nn import core as nn
from lpformer_tpu.ops.context import ContextTables, extract_context
from lpformer_tpu.ops.gather import gather_rows, gather_rows_valid
from lpformer_tpu.ops.segment import masked_softmax


# --------------------------------------------------------------------------
# init
# --------------------------------------------------------------------------

def _att_layer_init(
    key: jax.Array, in_ch: int, out_ch: int, heads: int, node_dim: int
) -> Dict:
    """One LinkTransformerLayer: GATv2-style attention + post LayerNorm
    (reference: src/modules/layers.py:88-157)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    lin_l = nn.linear_init(k1, in_ch, heads * out_ch, kind="glorot")
    lin_r = nn.linear_init(k2, node_dim * 2, heads * out_ch, kind="glorot")
    bound = (6.0 / (heads + out_ch)) ** 0.5  # PyG glorot on att [1, H, C]
    att = jax.random.uniform(
        k3, (heads, out_ch), jnp.float32, minval=-bound, maxval=bound
    )
    return {
        "lin_l": lin_l,
        "lin_r": lin_r,
        "att": att,
        "bias": jnp.zeros((heads * out_ch,), jnp.float32),
        "post_norm": nn.layer_norm_init(heads * out_ch),
    }


def init_lpformer(
    key: jax.Array, cfg: LPFormerConfig, in_dim: int
) -> Dict:
    if cfg.trans_layers > 2:
        # The reference's >2-layer stacking has inconsistent inner dims
        # (link_transformer.py:56-62); every published config uses 1.
        raise NotImplementedError("trans_layers > 2 is not supported")
    if cfg.trans_layers == 2 and cfg.num_heads != 1:
        # The reference itself is dimensionally broken here: layer 2's
        # lin_l takes in_channels=dim (modules/layers.py:130) but
        # receives heads*dim chunks of layer 1's concatenated output
        # (layers.py:212-214) — its own forward raises a matmul shape
        # error (pinned by tests/test_reference_parity.py::
        # test_two_layer_multihead_is_broken_in_reference_too).
        raise NotImplementedError(
            "trans_layers == 2 requires num_heads == 1 (the reference's "
            "own 2-layer multi-head stack is dimensionally inconsistent "
            "and crashes; see PARITY.md)"
        )
    keys = jax.random.split(key, 10)
    d = cfg.dim
    p: Dict = {}
    p["node_encoder"] = gcn_init(
        keys[0], in_dim, d, d, cfg.gnn_layers, cfg.layer_norm
    )
    p["gnn_norm"] = nn.layer_norm_init(d)
    p["elementwise_lin"] = nn.mlp_init(keys[1], 2, d, d, d)
    p["ppr_encoder_cn"] = nn.mlp_init(keys[2], 2, 2, d, d)
    if cfg.mask_mode != "cn":
        p["ppr_encoder_onehop"] = nn.mlp_init(keys[3], 2, 2, d, d)
    if cfg.mask_mode == "all":
        p["ppr_encoder_non1hop"] = nn.mlp_init(keys[4], 2, 2, d, d)

    att_layers = []
    inner = d * 2 if cfg.trans_layers > 1 else d
    att_layers.append(_att_layer_init(keys[5], d, inner, cfg.num_heads, d))
    if cfg.trans_layers == 2:
        att_layers.append(_att_layer_init(keys[6], d, d, cfg.num_heads, d))
    p["att_layers"] = att_layers

    pairwise_dim = d * cfg.num_heads + cfg.count_dim
    p["pairwise_lin"] = nn.mlp_init(keys[7], 2, pairwise_dim, pairwise_dim, d)

    # score head: mlp_score(out_dim, out_dim, 1, pred_layers)
    # (reference: src/train/train_model.py:97, other_models.py:142-179)
    p["score"] = nn.mlp_init(
        keys[8], cfg.pred_layers, cfg.out_dim, cfg.out_dim, 1, norm="none"
    )
    return p


# --------------------------------------------------------------------------
# apply
# --------------------------------------------------------------------------

def propagate(
    params: Dict,
    cfg: LPFormerConfig,
    graph: GraphBundle,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    edge_w: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """GNN node encoding + final LayerNorm -> X_node [N, dim]
    (reference: link_transformer.py:110-129, node_encoder.py:35-44)."""
    params = nn.cast_matmul_weights(params, cfg.mm_dtype)
    x = graph.x
    if train and cfg.feat_drop > 0 and rng is not None:
        x = nn.dropout(jax.random.fold_in(rng, 0), x, cfg.feat_drop, train)
    w = graph.edge_w if edge_w is None else edge_w
    # host-precomputed norm is only valid for the bundle's own weights
    norm = None
    if edge_w is None and getattr(graph, "w_norm", None) is not None:
        norm = (graph.w_norm, graph.w_diag)
    x = gcn_apply(
        params["node_encoder"],
        x,
        graph.edge_src,
        graph.edge_dst,
        w,
        graph.num_nodes,
        gnn_drop=cfg.gnn_drop,
        residual=cfg.residual,
        relu=cfg.relu,
        rng=None if rng is None else jax.random.fold_in(rng, 1),
        train=train,
        mm_dtype=cfg.mm_dtype,
        ell=getattr(graph, "ell", None),
        norm=norm,
        blk=getattr(graph, "blk", None),
        bbell=getattr(graph, "bbell", None),
    )
    return nn.layer_norm_apply(params["gnn_norm"], x)


def _fold_last(mlp_p: Dict, W: jnp.ndarray) -> Dict:
    """Compose an MLP's final (bare, reference: other_models.py:134-136)
    linear with a following linear ``W``, so ``mlp(x) @ W`` evaluates as
    one MLP whose output lands directly in the projected space — the
    [B, C, dim] intermediate never exists."""
    layers = list(mlp_p["layers"])
    last = {"w": layers[-1]["w"] @ W}
    if "b" in layers[-1]:
        last["b"] = layers[-1]["b"] @ W
    layers[-1] = last
    out = dict(mlp_p)
    out["layers"] = layers
    return out


def _pos_encodings(
    params: Dict, cfg: LPFormerConfig, ctx: ContextTables,
    W_fold: Optional[jnp.ndarray] = None,
    out_dtype=None,
) -> jnp.ndarray:
    """Symmetric PPR encodings pe = g(ppr_s, ppr_t) + g(ppr_t, ppr_s), one
    MLP per node class applied to its static block of the context table
    (reference: link_transformer.py:182-211). With ``W_fold`` the result
    is pe @ W_fold, computed by folding W_fold into each class MLP's
    final linear. ``out_dtype`` casts each block at creation (bf16 key
    tables under ``matmul_dtype``) so the [B, C, dim] f32 form never
    lands in HBM."""
    def sym(mlp_p, ps, pt):
        if W_fold is not None:
            mlp_p = _fold_last(mlp_p, W_fold)
        a = nn.mlp_apply(mlp_p, jnp.stack([ps, pt], axis=-1),
                         mm_dtype=cfg.mm_dtype)
        b = nn.mlp_apply(mlp_p, jnp.stack([pt, ps], axis=-1),
                         mm_dtype=cfg.mm_dtype)
        out = a + b
        return out if out_dtype is None else out.astype(out_dtype)

    c = cfg.context
    ps, pt = ctx.src_ppr, ctx.tgt_ppr
    if c.budget_combined is not None:
        # combined (class-tagged) table: every active class MLP runs
        # over the full [B, C] table and the per-slot class selects —
        # K-fold compute, but on a table sized to the TOTAL-count tail
        # (< 1/2 of the stacked per-class budgets), and the XLA path is
        # the fallback; the production kernel selects in VMEM
        out = None
        for name, code in _encoder_codes(cfg):
            pe = sym(params[name], ps, pt)
            m = (ctx.cls == code).astype(pe.dtype)[..., None]
            out = pe * m if out is None else out + pe * m
        return out
    blocks = []
    ofs = 0
    blocks.append(
        sym(params["ppr_encoder_cn"],
            ps[:, ofs:ofs + c.budget_cn], pt[:, ofs:ofs + c.budget_cn])
    )
    ofs += c.budget_cn
    if cfg.mask_mode != "cn":
        blocks.append(
            sym(params["ppr_encoder_onehop"],
                ps[:, ofs:ofs + c.budget_onehop],
                pt[:, ofs:ofs + c.budget_onehop])
        )
        ofs += c.budget_onehop
    if cfg.mask_mode == "all":
        blocks.append(
            sym(params["ppr_encoder_non1hop"],
                ps[:, ofs:], pt[:, ofs:])
        )
    return jnp.concatenate(blocks, axis=1)


def _encoder_codes(cfg: LPFormerConfig):
    """Active (encoder-name, context-class-code) pairs, in the canonical
    [cn(2), 1-hop(1), >1-hop(3)] order (codes: ops/context.ContextTables)."""
    pairs = [("ppr_encoder_cn", 2)]
    if cfg.mask_mode != "cn":
        pairs.append(("ppr_encoder_onehop", 1))
    if cfg.mask_mode == "all":
        pairs.append(("ppr_encoder_non1hop", 3))
    return pairs


def _gather_ids(ctx: ContextTables, num_real_rows: int) -> jnp.ndarray:
    """Context ids for the key-table gather, with PAD entries spread
    over a cycling iota instead of all pointing at the single pad row.

    Sparse-context presets leave 70-98% of the static budget columns
    invalid; those gathers all hitting ONE row serialize the TPU gather
    engine (measured 95.8 -> 62.8 ms for the [32768, 160] citation2-like
    key gather, bench --gather key_gather_spread_pad_ids). Invalid
    entries' values are exactly masked out downstream (alpha = 0 in both
    attention paths, dxj = 0 in backward), so any finite real row is
    semantically equivalent to the zero pad row.

    The cycle is WINDOWED to 4096 rows (~1-2 MB of key table), not the
    whole table: pad reads then stay in a cache-resident slice — on
    big-table presets (citation2's [1M, dim] keys) full-table spreading
    makes the mostly-dead gather pay big-footprint random-read cost for
    rows whose values are discarded. 4096 distinct rows is plenty to
    avoid the same-row serialization above."""
    b, c = ctx.ids.shape
    spread = (
        jax.lax.iota(jnp.int32, b * c) % min(num_real_rows, 4096)
    ).reshape(b, c)
    return jnp.where(ctx.valid, ctx.ids, spread)


def _project_keys(
    lp: Dict, params: Dict, cfg: LPFormerConfig,
    X_node: jnp.ndarray, ctx: ContextTables,
) -> jnp.ndarray:
    """xj = [x_v ‖ pe_v] @ W_r + b_r  without materializing the
    [B, C, 2*dim] key table (reference computes it explicitly,
    layers.py:130,193-224): split W_r into its node and pe halves, so
      xj = gather(X_node @ W_top)[ids] + pe_folded(ppr) + b_r.
    The node half runs once in [N, dim] space (N << B*C) and the pe
    half lands directly in the projected space via _fold_last."""
    d = X_node.shape[-1]
    W = lp["lin_r"]["w"]
    X_proj = nn.matmul(X_node, W[:d], cfg.mm_dtype)       # [N, H*O]
    # Under matmul_dtype the whole key table lives in bf16: the [B,C,H*O]
    # gather/pe/xj tensors (the pairwise block's dominant HBM traffic,
    # both directions) halve; softmax stats and accumulations stay f32
    # downstream via dtype promotion.
    kd = cfg.mm_dtype or X_proj.dtype
    X_proj = X_proj.astype(kd)
    # pad row N = zeros kept for shape compatibility; the actual gather
    # spreads pad ids over real rows (values masked downstream) to avoid
    # single-row gather serialization (_gather_ids)
    n_real = X_proj.shape[0]
    X_proj = jnp.concatenate(
        [X_proj, jnp.zeros((1, X_proj.shape[-1]), X_proj.dtype)], axis=0
    )
    # validity-aware gather: dead slots' zero cotangents are dropped
    # in the scatter VJP instead of permuted+accumulated (ops/gather.py)
    xj = gather_rows_valid(
        X_proj, _gather_ids(ctx, n_real), ctx.valid
    )                                                     # [B, C, H*O]
    xj = xj + _pos_encodings(params, cfg, ctx, W_fold=W[d:], out_dtype=kd)
    if "b" in lp["lin_r"]:
        xj = xj + lp["lin_r"]["b"].astype(kd)
    return xj


def _att_layer_apply(
    lp: Dict,
    cfg: LPFormerConfig,
    edge_x: jnp.ndarray,     # [B, 2*q]
    xj: jnp.ndarray,         # [B, C, H*O] projected keys (_project_keys)
    valid: jnp.ndarray,      # [B, C]
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    return_weights: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """GATv2-ish per-link attention (reference: layers.py:193-224):
      score(v) = att · leaky_relu( W_r[x_v‖pe_v] ⊙ (W_l x_a + W_l x_b) )
      out      = Σ_v softmax(score)_v · W_r[x_v‖pe_v]
    followed by post-LayerNorm + dropout (layers.py:78-80)."""
    h = cfg.num_heads
    b_, c_, _ = xj.shape
    half = edge_x.shape[-1] // 2
    ho = lp["lin_l"]["w"].shape[1]
    o = ho // h
    e1 = nn.linear_apply(lp["lin_l"], edge_x[:, :half], cfg.mm_dtype)
    e2 = nn.linear_apply(lp["lin_l"], edge_x[:, half:], cfg.mm_dtype)

    xj = xj.reshape(b_, c_, h, o)
    e1 = e1.reshape(b_, 1, h, o)
    e2 = e2.reshape(b_, 1, h, o)

    z = jax.nn.leaky_relu(xj * (e1 + e2), negative_slope=0.2)
    logits = jnp.sum(z * lp["att"][None, None], axis=-1)  # [B, C, H]
    alpha = masked_softmax(logits, valid[:, :, None], axis=1)

    out = jnp.sum(alpha[..., None] * xj, axis=1)          # [B, H, O]
    out = out.reshape(b_, h * o) + lp["bias"]
    out = nn.layer_norm_apply(lp["post_norm"], out)
    if train and cfg.dropout > 0 and rng is not None:
        out = nn.dropout(rng, out, cfg.dropout, train)
    return out, alpha


def _pe_tiles(cfg: LPFormerConfig) -> Tuple[int, tuple]:
    """(c_tile, per-tile class indices) for the fused PE+attention kernel;
    (0, ()) when the class budgets don't align to a single-class tiling.
    Auto mode (use_pallas_attention=None) requires tiles >= 32 rows;
    forcing the flag True accepts any tile >= 8 (small test shapes)."""
    from lpformer_tpu.ops.pallas.pe_attention import pe_attention_tile

    c = cfg.context
    if c.budget_combined is not None:
        # combined table: tiles are mixed-class; the mixed kernel selects
        # per-slot weights in VMEM, so any tile dividing the budget
        # works. Cap the tile at 32 rows: dead-tile gating needs
        # fine-grained tiles (the table is front-compacted per link with
        # a p50 count of ~2, so most of the budget width is dead — one
        # 128-wide tile per block never gates; measured 14.8 ms vs the
        # classic kernel's 8.1 on the collab-like step).
        import math

        ct = pe_attention_tile(
            [math.gcd(c.budget_combined, 32)],
            min_tile=8 if cfg.use_pallas_attention else 32,
        )
        return ct, None
    budgets = [c.budget_cn]
    if cfg.mask_mode != "cn":
        budgets.append(c.budget_onehop)
    if cfg.mask_mode == "all":
        budgets.append(c.budget_non1hop)
    ct = pe_attention_tile(
        budgets, min_tile=8 if cfg.use_pallas_attention else 32
    )
    if ct == 0:
        return 0, ()
    tiles = []
    for k, bgt in enumerate(budgets):
        tiles.extend([k] * (bgt // ct))
    return ct, tuple(tiles)


def _att_layer_apply_pallas(
    lp: Dict,
    params: Dict,
    cfg: LPFormerConfig,
    edge_x: jnp.ndarray,     # [B, 2*q]
    xj_node: jnp.ndarray,    # [B, C, H*O] gathered projected node keys
    ctx: ContextTables,
    c_tile: int,
    tile_classes: tuple,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> Tuple[jnp.ndarray, None]:
    """Fully-fused pairwise block (ops/pallas/pe_attention.py): the PPR
    positional-encoding MLPs, the key projection, and the masked per-link
    attention run in ONE kernel that streams C-tiles through VMEM — no
    [B, C, dim] PE/key/score tensor exists in HBM in either direction.
    The folding below happens in plain jnp so the kernel's stacked-weight
    grads flow back to the true parameter leaves."""
    from lpformer_tpu.ops.pallas.pe_attention import fused_pe_link_attention

    half = edge_x.shape[-1] // 2
    e1 = nn.linear_apply(lp["lin_l"], edge_x[:, :half], cfg.mm_dtype)
    e2 = nn.linear_apply(lp["lin_l"], edge_x[:, half:], cfg.mm_dtype)

    d = cfg.dim
    W_fold = lp["lin_r"]["w"][d:].astype(jnp.float32)          # [dim, H*O]
    r_bias = lp["lin_r"].get("b")
    ho = W_fold.shape[1]
    if r_bias is None:
        r_bias = jnp.zeros((ho,), jnp.float32)
    enc_names = ["ppr_encoder_cn"]
    if cfg.mask_mode != "cn":
        enc_names.append("ppr_encoder_onehop")
    if cfg.mask_mode == "all":
        enc_names.append("ppr_encoder_non1hop")
    w1, b1, g_ln, b_ln, w2f, cbias = [], [], [], [], [], []
    for name in enc_names:
        mp = params[name]
        l1, l2 = mp["layers"]
        w1.append(l1["w"].astype(jnp.float32))
        b1.append(l1["b"].astype(jnp.float32))
        g_ln.append(mp["norm"]["g"].astype(jnp.float32))
        b_ln.append(mp["norm"]["b"].astype(jnp.float32))
        w2f.append(l2["w"].astype(jnp.float32) @ W_fold)
        cbias.append(2.0 * (l2["b"].astype(jnp.float32) @ W_fold) + r_bias)

    if tile_classes is None:
        # combined class-tagged table: per-slot class selection in-kernel
        from lpformer_tpu.ops.pallas.pe_attention_mixed import (
            fused_pe_link_attention_mixed,
        )

        ecls = jnp.zeros(ctx.cls.shape, jnp.int32)
        for k, (_, code) in enumerate(_encoder_codes(cfg)):
            ecls = jnp.where(ctx.cls == code, k, ecls)
        out = fused_pe_link_attention_mixed(
            xj_node, ctx.src_ppr, ctx.tgt_ppr, ctx.valid, ecls, e1 + e2,
            jnp.stack(w1), jnp.stack(b1), jnp.stack(g_ln), jnp.stack(b_ln),
            jnp.stack(w2f), jnp.stack(cbias),
            lp["att"], lp["bias"],
            c_tile=c_tile,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        out = fused_pe_link_attention(
            xj_node, ctx.src_ppr, ctx.tgt_ppr, ctx.valid, e1 + e2,
            jnp.stack(w1), jnp.stack(b1), jnp.stack(g_ln), jnp.stack(b_ln),
            jnp.stack(w2f), jnp.stack(cbias),
            lp["att"], lp["bias"],
            c_tile=c_tile, tile_classes=tile_classes,
            interpret=jax.default_backend() != "tpu",
        )
    out = nn.layer_norm_apply(lp["post_norm"], out)
    if train and cfg.dropout > 0 and rng is not None:
        out = nn.dropout(rng, out, cfg.dropout, train)
    return out, None


def calc_pairwise(
    params: Dict,
    cfg: LPFormerConfig,
    X_node: jnp.ndarray,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    ctx: ContextTables,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    return_weights: bool = False,
):
    """Pairwise term over the extracted context tables
    (reference: link_transformer.py:132-178)."""
    pairwise_feats = jnp.concatenate(
        [gather_rows(X_node, src), gather_rows(X_node, tgt)], axis=-1
    )

    want_pallas = cfg.use_pallas_attention
    if want_pallas is None:  # auto: the kernel wins on TPU (STATUS r2)
        want_pallas = jax.default_backend() == "tpu"
    c_tile, tile_classes = (0, ())
    if want_pallas and cfg.num_heads == 1 and not return_weights:
        c_tile, tile_classes = _pe_tiles(cfg)
    use_pallas = c_tile > 0

    def attend(params, X_node, pairwise_feats, ctx, rng):
        att_weights = None
        for i, lp in enumerate(params["att_layers"]):
            r = None if rng is None else jax.random.fold_in(rng, 10 + i)
            feats_in = pairwise_feats if i == 0 else pairwise_feats_
            if use_pallas:
                # node half pre-projected in [N] space (N << B*C), PE half
                # computed inside the kernel from the [B, C] ppr tables
                d = X_node.shape[-1]
                W = lp["lin_r"]["w"]
                X_proj = nn.matmul(X_node, W[:d], cfg.mm_dtype)
                kd = cfg.mm_dtype or X_proj.dtype
                n_real = X_proj.shape[0]
                X_proj = jnp.concatenate(
                    [X_proj.astype(kd), jnp.zeros((1, W.shape[1]), kd)],
                    axis=0,
                )
                # pad ids spread over real rows (_gather_ids): masked in
                # the kernel, avoids single-row gather serialization
                xj_node = gather_rows_valid(
                    X_proj, _gather_ids(ctx, n_real), ctx.valid
                )                                              # [B, C, H*O]
                pairwise_feats_, att_weights = _att_layer_apply_pallas(
                    lp, params, cfg, feats_in, xj_node, ctx,
                    c_tile, tile_classes, rng=r, train=train,
                )
            else:
                xj = _project_keys(lp, params, cfg, X_node, ctx)
                pairwise_feats_, att_weights = _att_layer_apply(
                    lp, cfg, feats_in, xj, ctx.valid, rng=r, train=train,
                    return_weights=return_weights,
                )
        return pairwise_feats_, att_weights

    remat = cfg.remat_pairwise
    if remat is None:
        # auto: the largest pairwise-space activation held for backward
        # ([B, C, dim] xj_node / xj on either path). Threshold calibrated
        # by the ppa-like preset: 2.7 GB held OOM'd a 16 GB chip by
        # 0.64 GB (sub-128 dims also lane-pad 2x in HBM), so remat kicks
        # in at 2 GB.
        bsz, ctot = ctx.ids.shape
        remat = bsz * ctot * cfg.dim * 4 > 2e9
    if remat and not return_weights:
        attend = jax.checkpoint(attend)
    pairwise_feats, att_weights = attend(
        params, X_node, pairwise_feats, ctx, rng
    )

    counts = ctx.counts  # [B, 4]: cns, 1hop, non1hop, neighbors
    if cfg.mask_mode == "cn":
        cnt = counts[:, 0:1]
    elif cfg.mask_mode == "1-hop":
        cnt = jnp.concatenate(
            [counts[:, 0:1], counts[:, 1:2], counts[:, 3:4]], axis=-1
        )
    else:
        cnt = counts  # (cns, 1hop, non1hop, neighbors), reference :172-173
    pairwise_feats = jnp.concatenate([pairwise_feats, cnt], axis=-1)
    pairwise_feats = nn.mlp_apply(
        params["pairwise_lin"], pairwise_feats, mm_dtype=cfg.mm_dtype
    )
    if return_weights:
        return pairwise_feats, att_weights
    return pairwise_feats, None


def forward(
    params: Dict,
    cfg: LPFormerConfig,
    graph: GraphBundle,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
    mask_ranks: Optional[jnp.ndarray] = None,
    prop_edge_w: Optional[jnp.ndarray] = None,
    X_node: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Full edge representation h(a,b) [B, 2*dim]
    (reference: link_transformer.py:82-107). Pass ``X_node`` to reuse a
    propagated encoding (the propagate-once eval paths,
    reference: testing.py:50-74,96-121)."""
    # one convert per weight per program, not one per use site (the
    # duplicates are CSE'd with propagate()/score_links()'s casts)
    params = nn.cast_matmul_weights(params, cfg.mm_dtype)
    if X_node is None:
        X_node = propagate(
            params, cfg, graph, rng=rng, train=train, edge_w=prop_edge_w
        )
    elementwise = nn.mlp_apply(
        params["elementwise_lin"],
        gather_rows(X_node, src) * gather_rows(X_node, tgt),
        mm_dtype=cfg.mm_dtype,
    )
    ctx = extract_context(
        graph.adj_rows,
        graph.ppr_rows,
        src,
        tgt,
        cfg.context,
        mask_ranks=mask_ranks,
        drop_rng=None if rng is None else jax.random.fold_in(rng, 2),
        train=train,
    )
    pairwise, _ = calc_pairwise(
        params, cfg, X_node, src, tgt, ctx,
        rng=None if rng is None else jax.random.fold_in(rng, 3),
        train=train,
    )
    return jnp.concatenate([elementwise, pairwise], axis=-1)


def score_links(
    params: Dict,
    cfg: LPFormerConfig,
    h: jnp.ndarray,
    *,
    rng: Optional[jax.Array] = None,
    train: bool = False,
) -> jnp.ndarray:
    """sigmoid(mlp_score(h)) -> [B] link probabilities
    (reference: other_models.py:173-179)."""
    return nn.mlp_apply(
        nn.cast_matmul_weights(params["score"], cfg.mm_dtype), h,
        drop=cfg.pred_drop, rng=rng, train=train,
        sigmoid=True, mm_dtype=cfg.mm_dtype,
    )
