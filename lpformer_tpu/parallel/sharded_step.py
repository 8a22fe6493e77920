"""Sharded training step over a (data x graph) mesh via shard_map.

Collective design (the reference is single-device; SURVEY §2.4 plans this
layer as new):
  * GCN encoder: node features row-sharded over 'graph'. Per layer, each
    device transforms its row shard on the MXU, all-gathers the
    transformed shard over 'graph' (ICI), runs its LOCAL edge block's
    gather + segment_sum, and psums partial row aggregates over 'data' —
    so the SpMM work is split across the entire mesh.
  * Link loss: the (pos+neg) link batch is sharded over BOTH axes; the
    per-link context extraction and attention run locally against the
    all-gathered node encodings; scalar loss terms are psum'd.
  * Batch-positive masking: the full batch is all-gathered (ids only,
    tiny) so every device applies the same global masked-edge set —
    exactly the single-device semantics.
  * Gradients of the replicated params come out of shard_map's transpose
    (the all-gathers transpose to reduce-scatters; loss psums make the
    scalar replicated), so jax.grad around the sharded loss yields
    correctly summed gradients with no manual pmean.

Partition invariance (1-device == N-device allclose) is tested in
tests/test_parallel.py.
"""
from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.7 public API
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

import optax

from lpformer_tpu.models import link_transformer as lt
from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.nn import core as nn
from lpformer_tpu.ops import masking
from lpformer_tpu.ops.context import extract_context
from lpformer_tpu.parallel.partition import ShardedGraph
from lpformer_tpu.train.step import TrainState


def _gcn_sharded(
    params,
    cfg: LPFormerConfig,
    x_shard,           # [rows, F]
    es, ed, ew,        # [E_blk] local edge block (src global, dst local)
    diag_shard,        # [rows]
    rows_per: int,
    rng,
    train: bool,
):
    lns = params.get("lns")
    x = x_shard
    for i, conv in enumerate(params["convs"]):
        y_shard = x @ conv["w"]
        y_full = jax.lax.all_gather(y_shard, "graph", axis=0, tiled=True)
        part = jax.ops.segment_sum(
            y_full[es] * ew[:, None], ed, num_segments=rows_per,
            indices_are_sorted=True,
        )
        xi = jax.lax.psum(part, "data") + diag_shard[:, None] * y_shard
        xi = xi + conv["bias"]
        if lns is not None:
            xi = nn.layer_norm_apply(lns[i], xi)
        if train and cfg.gnn_drop > 0 and rng is not None:
            xi = nn.dropout(
                jax.random.fold_in(rng, i), xi, cfg.gnn_drop, train
            )
        if cfg.relu:
            xi = jax.nn.relu(xi)
        if cfg.residual and x.shape[-1] == xi.shape[-1]:
            x = x + xi
        else:
            x = xi
    return x


def make_sharded_loss(
    cfg: LPFormerConfig,
    mesh: Mesh,
    num_nodes: int,
    rows_per: int,
    train: bool = True,
):
    """Returns loss(params, sg_arrays..., batches..., rng) -> scalar,
    internally shard_mapped over the mesh."""

    def inner(
        params,
        x_sh, es, ed, ew, diag_sh,      # sharded graph arrays
        adj_rows, ppr_rows, mult,       # replicated context state
        psrc, ptgt, pw, nsrc, ntgt, nw,  # link shards
        rng,
    ):
        es, ed, ew = es[0, 0], ed[0, 0], ew[0, 0]
        didx = jax.lax.axis_index("data")
        gidx = jax.lax.axis_index("graph")
        # Encoder dropout must be IDENTICAL across the 'data' axis: the
        # edge-block partial sums are psum'd over 'data', so every data
        # shard must see the same dropped activations for its node rows.
        # Fold only the graph index for the encoder; links (sharded over
        # both axes) get the fully device-unique rng.
        enc_rng = jax.random.fold_in(rng, gidx)
        dev_rng = jax.random.fold_in(
            jax.random.fold_in(rng, didx), gidx
        )

        # ---- propagate (sharded GCN + final LN) ----
        feats = x_sh
        if train and cfg.feat_drop > 0:
            feats = nn.dropout(
                jax.random.fold_in(enc_rng, 0), feats, cfg.feat_drop, train
            )
        X_shard = _gcn_sharded(
            params["node_encoder"], cfg, feats, es, ed, ew, diag_sh,
            rows_per, jax.random.fold_in(enc_rng, 1), train,
        )
        X_shard = nn.layer_norm_apply(params["gnn_norm"], X_shard)
        X_full = jax.lax.all_gather(X_shard, "graph", axis=0, tiled=True)
        X_full = X_full[:num_nodes]

        # ---- global batch mask (reference masks ALL batch positives) ----
        g_src = jax.lax.all_gather(
            jax.lax.all_gather(psrc, "graph", axis=0, tiled=True),
            "data", axis=0, tiled=True,
        )
        g_tgt = jax.lax.all_gather(
            jax.lax.all_gather(ptgt, "graph", axis=0, tiled=True),
            "data", axis=0, tiled=True,
        )
        mask_ranks = masking.batch_mask_ranks(adj_rows, g_src, g_tgt, mult)

        def link_scores(src, tgt, ranks, tag):
            r = jax.random.fold_in(dev_rng, tag)
            ctx = extract_context(
                adj_rows, ppr_rows, src, tgt, cfg.context,
                mask_ranks=ranks,
                drop_rng=jax.random.fold_in(r, 2), train=train,
            )
            from lpformer_tpu.ops.gather import gather_rows

            elementwise = nn.mlp_apply(
                params["elementwise_lin"],
                gather_rows(X_full, src) * gather_rows(X_full, tgt),
            )
            pairwise, _ = lt.calc_pairwise(
                params, cfg, X_full, src, tgt, ctx,
                rng=jax.random.fold_in(r, 3), train=train,
            )
            h = jnp.concatenate([elementwise, pairwise], axis=-1)
            return lt.score_links(
                params, cfg, h, rng=jax.random.fold_in(r, 4), train=train
            )

        pos_out = link_scores(psrc, ptgt, mask_ranks, 10)
        neg_out = link_scores(nsrc, ntgt, None, 11)

        pos_sum = jnp.sum(jnp.log(pos_out + 1e-6) * pw)
        neg_sum = jnp.sum(jnp.log(1.0 - neg_out + 1e-6) * nw)
        pos_cnt = jnp.sum(pw)
        neg_cnt = jnp.sum(nw)
        tot = jax.lax.psum(
            jnp.stack([pos_sum, neg_sum, pos_cnt, neg_cnt]),
            ("data", "graph"),
        )
        return -(tot[0] / jnp.maximum(tot[2], 1.0)) - (
            tot[1] / jnp.maximum(tot[3], 1.0)
        )

    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),                                   # params
            P("graph", None),                      # x rows
            P("graph", "data", None),              # edge blocks
            P("graph", "data", None),
            P("graph", "data", None),
            P("graph"),                            # diag rows
            P(), P(), P(),                         # adj/ppr rows, mult
            P(("data", "graph")),                  # pos src
            P(("data", "graph")),
            P(("data", "graph")),
            P(("data", "graph")),                  # neg src
            P(("data", "graph")),
            P(("data", "graph")),
            P(),                                   # rng
        ),
        out_specs=P(),
        check_vma=False,
    )

    def loss_fn(params, sg: ShardedGraph, mult, psrc, ptgt, pw,
                nsrc, ntgt, nw, rng):
        return sharded(
            params, sg.x, sg.edge_src, sg.edge_dst_local, sg.edge_w,
            sg.diag, sg.adj_rows, sg.ppr_rows, mult,
            psrc, ptgt, pw, nsrc, ntgt, nw, rng,
        )

    return loss_fn


def make_sharded_score(
    cfg: LPFormerConfig,
    mesh: Mesh,
    num_nodes: int,
    rows_per: int,
):
    """Sharded eval scorer: (params, sg, src, tgt) -> scores [B].
    Propagation is graph-sharded; the link batch is sharded over the full
    mesh; no masking, no dropout (eval semantics)."""

    def inner(params, x_sh, es, ed, ew, diag_sh, adj_rows, ppr_rows,
              src, tgt):
        es, ed, ew = es[0, 0], ed[0, 0], ew[0, 0]
        X_shard = _gcn_sharded(
            params["node_encoder"], cfg, x_sh, es, ed, ew, diag_sh,
            rows_per, None, False,
        )
        X_shard = nn.layer_norm_apply(params["gnn_norm"], X_shard)
        X_full = jax.lax.all_gather(X_shard, "graph", axis=0, tiled=True)
        X_full = X_full[:num_nodes]

        from lpformer_tpu.ops.gather import gather_rows

        ctx = extract_context(
            adj_rows, ppr_rows, src, tgt, cfg.context, train=False
        )
        elementwise = nn.mlp_apply(
            params["elementwise_lin"],
            gather_rows(X_full, src) * gather_rows(X_full, tgt),
        )
        pairwise, _ = lt.calc_pairwise(
            params, cfg, X_full, src, tgt, ctx, train=False
        )
        h = jnp.concatenate([elementwise, pairwise], axis=-1)
        return lt.score_links(params, cfg, h, train=False)

    sharded = shard_map(
        inner,
        mesh=mesh,
        in_specs=(
            P(),
            P("graph", None),
            P("graph", "data", None),
            P("graph", "data", None),
            P("graph", "data", None),
            P("graph"),
            P(), P(),
            P(("data", "graph")),
            P(("data", "graph")),
        ),
        out_specs=P(("data", "graph")),
        check_vma=False,
    )

    @jax.jit
    def score(params, sg: ShardedGraph, src, tgt):
        return sharded(
            params, sg.x, sg.edge_src, sg.edge_dst_local, sg.edge_w,
            sg.diag, sg.adj_rows, sg.ppr_rows, src, tgt,
        )

    return score


def make_sharded_train_step(
    cfg: LPFormerConfig,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    num_nodes: int,
    rows_per: int,
    num_negative: int = 1,
):
    loss_fn = make_sharded_loss(cfg, mesh, num_nodes, rows_per, train=True)

    def step(state: TrainState, sg: ShardedGraph, mult, src, tgt, w, rng):
        rng_step = jax.random.fold_in(rng, state.step)
        rng_neg, rng_loss = jax.random.split(rng_step)
        b = src.shape[0]
        neg = jax.random.randint(
            rng_neg, (2, b * num_negative), 0, num_nodes, dtype=src.dtype
        )
        nw = jnp.repeat(w, num_negative)
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, sg, mult, src, tgt, w, neg[0], neg[1], nw,
            rng_loss,
        )
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))
