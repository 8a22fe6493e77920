"""Per-link context-set extraction with static shapes.

This replaces the reference's dynamic sparse-COO algebra — sparse
index_select / mul / add / coalesce over N x N tensors per batch
(reference: src/models/link_transformer.py:214-319,434-481) — with fixed
shape gathers and vectorized binary searches over padded per-node rows:

  * CN / 1-hop candidates: the union of the (batch-masked) adjacency rows
    of src and tgt. Node classes: in both rows -> CN (2), in exactly one
    -> 1-hop (1)   [reference :232-237].
  * PPR values ppr(src, v), ppr(tgt, v) are looked up by binary search in
    the sorted padded PPR rows; absent => 0.0 — mirroring the
    multiply-add-coalesce trick of get_ppr_vals [reference :279-319] that
    keeps zero-PPR context nodes alive.
  * Threshold filter: CN kept iff both PPRs >= thresh_cn; 1-hop kept iff
    both >= thresh_1hop [reference :241-250].
  * >1-hop candidates ("all" mode): the PPR row of src intersected with
    the PPR row support of tgt, minus the *unmasked* 1-hop neighborhoods
    of src and tgt (deliberately unmasked — reference :434-481 and its
    NOTE), kept iff both PPRs >= thresh_non1hop. (For thresh_non1hop == 0
    the reference would additionally admit support-of-tgt-only nodes with
    a 0.0 src score; all published configs use thresh > 0 where the
    intersection is exact.)
  * Attention dropout = context subsampling [reference :322-337]: i.i.d.
    Bernoulli(1 - att_drop) keep mask per entry at train time (the
    reference keeps an exact global fraction via randperm; expected
    counts match).
  * Structure counts are computed on the post-dropout kept sets, before
    any budget truncation — exact w.r.t. the reference
    [reference :340-386].

Each class is then compacted to a static per-class budget (prefix-sum +
one-hot MXU scatter: on overflow the entries with the largest
``ppr_s + ppr_t`` are kept, ties broken toward ascending node id — see
:func:`_compact`; the reference has no budgets, so overflow handling is
a framework approximation; counts stay exact). Overflow is reported per
link so callers can size budgets (budget = cap is exact).

With ``budget_combined`` set, the per-class blocks are replaced by ONE
class-tagged table: the raw candidate segments (disjoint by
construction) compact in a single 4-lane pass with a per-slot class
code, and overflow keeps the global top by ``ppr_s + ppr_t``. Class
count tails do not stack, so a total-tail-sized combined table carries
the same context sets in far fewer static slots — the production
performance mode (bench presets; the r5 collab-like step dropped 23%).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from lpformer_tpu.graph.containers import PaddedRows
from lpformer_tpu.ops import masking
from lpformer_tpu.ops.search import (
    row_contains,
    row_lookup_value,
    row_member_values,
)


@dataclasses.dataclass(frozen=True)
class ContextConfig:
    mask_mode: str           # "cn" | "1-hop" | "all"  [reference :39-44]
    thresh_cn: float = 0.0
    thresh_1hop: float = 1e-2
    thresh_non1hop: float = 1e-2
    budget_cn: int = 128
    budget_onehop: int = 256
    budget_non1hop: int = 128
    att_drop: float = 0.0
    # Combined (class-tagged) context table: one cross-class budget
    # instead of per-class blocks. Class count tails do not stack (the
    # collab-like bench: per-class p99.9 budgets 64/128/128 = 320 slots
    # vs a measured p100 TOTAL of ~107), so a combined table sized to
    # the total-count tail carries the SAME context sets in ~1/3 the
    # static slots — the [B, C] width drives the key gather, the fused
    # attention kernel, and its scatter VJP (~40% of the r4 step).
    # None = classic per-class blocks. Overflow policy stays top-by-
    # (ppr_s + ppr_t), now across classes (see _compact).
    budget_combined: "int | None" = None

    @staticmethod
    def from_thresholds(
        thresh_cn: float,
        thresh_1hop: float,
        thresh_non1hop: float,
        **kw,
    ) -> "ContextConfig":
        """Mask-mode derivation from thresholds, exactly as the reference
        (a threshold of 1 excludes that node class) [reference :39-44]."""
        if thresh_non1hop == 1 and thresh_1hop == 1:
            mode = "cn"
        elif thresh_non1hop == 1 and thresh_1hop < 1:
            mode = "1-hop"
        else:
            mode = "all"
        return ContextConfig(
            mask_mode=mode,
            thresh_cn=thresh_cn,
            thresh_1hop=thresh_1hop,
            thresh_non1hop=thresh_non1hop,
            **kw,
        )

    @property
    def total_budget(self) -> int:
        if self.budget_combined is not None:
            return self.budget_combined
        if self.mask_mode == "cn":
            return self.budget_cn
        if self.mask_mode == "1-hop":
            return self.budget_cn + self.budget_onehop
        return self.budget_cn + self.budget_onehop + self.budget_non1hop

    @property
    def count_dim(self) -> int:
        # [reference :67-78]
        return {"cn": 1, "1-hop": 3, "all": 4}[self.mask_mode]


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "ids", "cls", "src_ppr", "tgt_ppr", "valid", "counts", "overflow",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class ContextTables:
    """Compacted per-link context tables, class-blocked along axis 1 in the
    order [cn | 1-hop | >1-hop] (present blocks depend on mask mode)."""

    ids: jnp.ndarray      # [B, C] int32 context node ids (pad: num_nodes)
    cls: jnp.ndarray      # [B, C] int32: 0 invalid, 1 one-hop, 2 cn, 3 >1hop
    src_ppr: jnp.ndarray  # [B, C] float32 ppr(src, v)
    tgt_ppr: jnp.ndarray  # [B, C] float32 ppr(tgt, v)
    valid: jnp.ndarray    # [B, C] bool
    counts: jnp.ndarray   # [B, 4] float32: num_cns, num_1hop, num_non1hop,
                          #                 num_neighbors (pre-truncation)
    overflow: jnp.ndarray  # [B] int32 entries dropped by budgets


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "adj_nbrs", "adj_vals", "adj_ranks", "ppr_nbrs", "ppr_vals",
        "ppr_flags",
    ],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class LinkRows:
    """Row views for one endpoint list [B]: the adjacency and PPR rows of
    each node, gathered out of the padded row tables. Separating the
    *gather* from the *extraction* lets the sharded path substitute a
    collective (psum_scatter) gather over row-sharded tables while the
    single-device path gathers locally — the extraction math
    (:func:`extract_context_rows`) is identical.

    adj_nbrs  [B, A] int32  sorted neighbor ids (pad = num_nodes)
    adj_vals  [B, A] f32    self-PPR ppr(u, N(u)) or None
    adj_ranks [B, A] int32  train-edge ranks or None (-1 = none)
    ppr_nbrs  [B, P] int32  sorted PPR support (pad = num_nodes)
    ppr_vals  [B, P] f32    ppr(u, v)
    ppr_flags [B, P] bool   "v is in u's (unmasked) 1-hop" or None
    """

    adj_nbrs: jnp.ndarray
    adj_vals: Optional[jnp.ndarray]
    adj_ranks: Optional[jnp.ndarray]
    ppr_nbrs: jnp.ndarray
    ppr_vals: jnp.ndarray
    ppr_flags: Optional[jnp.ndarray]


def gather_link_rows(
    adj_rows: PaddedRows,
    ppr_rows: PaddedRows,
    idx: jnp.ndarray,
    with_ranks: bool = True,
) -> LinkRows:
    """Local (single-device) row gather for a node list [B]."""
    return LinkRows(
        adj_nbrs=adj_rows.nbrs[idx],
        adj_vals=None if adj_rows.vals is None else adj_rows.vals[idx],
        adj_ranks=(
            None
            if (adj_rows.ranks is None or not with_ranks)
            else adj_rows.ranks[idx]
        ),
        ppr_nbrs=ppr_rows.nbrs[idx],
        ppr_vals=ppr_rows.vals[idx],
        ppr_flags=None if ppr_rows.flags is None else ppr_rows.flags[idx],
    )


def _compact(
    ids, cls_val, ps, pt, valid, budget: int, num_nodes: int
):
    """Compact each row's valid entries into exactly ``budget`` columns.

    Prefix-sum positions + a one-hot scatter reduced by a single batched
    dot_general on the MXU — no sorts and no row-wise dynamic gathers
    (profiling showed argsort+take_along_axis compaction at ~60ms/class
    on a [4096, 256] table; this form is ~2ms). On overflow the entries
    with the largest ``ppr_s + ppr_t`` are kept (ties broken toward the
    FIRST entries, i.e. ascending node id) — mirroring the top-by-weight
    cap policy of :meth:`PaddedRows.from_csr`, so budget pressure drops
    the *least important* context nodes. The reference has no budgets
    (budget = cap is exact); counts stay exact regardless. Values ride
    f32 lanes: ids+1 and both PPR values are exact for graphs with
    N < 2^24 (all targets; ogbl-citation2 is 2.9M); the +1 folds the
    validity lane into the id lane (empty columns reduce to 0), keeping
    the contraction at 3 lanes — XLA lowers it to a fused VPU
    compare+select+reduce whose cost scales with the lane count (r4
    profiling). Exactness REQUIRES Precision.HIGHEST on the
    dot_general: TPU DEFAULT matmul precision truncates f32 inputs to
    bf16 (8 mantissa bits), which rounds any node id > 256 (verified on
    v5e: id 123456 came back 123392) if XLA ever materializes this on
    the MXU.

    The top-k selection avoids a full sort: ``lax.top_k`` on the score
    alone finds the row's k-th score (values only, no gather of the
    payload); entries strictly above it are kept, and ties at the
    threshold are admitted in ascending-id order via a prefix count.
    The surviving set then compacts with the same one-hot scatter.

    ``cls_val`` is a scalar class code when each class compacts its own
    table (3-lane contraction), or a [B, I] per-slot class array for the
    COMBINED cross-class compaction (``budget_combined``), which adds a
    4th cls lane and makes the top-by-ppr retention global across
    classes. Returns (ids, cls, ps, pt, valid, n_dropped).
    """
    mixed_cls = jnp.ndim(cls_val) != 0
    b, i = valid.shape
    if i > budget:
        # top-by-(ppr_s + ppr_t) retention under budget pressure
        neg_inf = jnp.float32(-jnp.inf)
        score = jnp.where(valid, ps + pt, neg_inf)              # [B, I]
        kth = jax.lax.top_k(score, budget)[0][:, -1]            # [B]
        keep_hi = valid & (score > kth[:, None])
        at_thr = valid & (score == kth[:, None])
        n_hi = jnp.sum(keep_hi.astype(jnp.int32), axis=1)
        room = jnp.maximum(budget - n_hi, 0)[:, None]
        thr_rank = jnp.cumsum(at_thr.astype(jnp.int32), axis=1) - 1
        keep = keep_hi | (at_thr & (thr_rank < room))
    else:
        keep = valid
    pos = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1        # [B, I]
    pos = jnp.where(keep, pos, budget)                          # park invalid
    oh = (
        pos[:, :, None] == jnp.arange(budget, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)                                       # [B, I, O]
    # 3 lanes, not 4: the validity lane is folded into ids+1 (empty
    # columns reduce to 0, real ids come back as id+1; id+1 <= 2^24 is
    # exact in f32 for every target graph) — the fused VPU reduce XLA
    # emits for this contraction scales with the lane count (r4)
    lanes = [
        ids.astype(jnp.float32) + 1.0,
        ps.astype(jnp.float32),
        pt.astype(jnp.float32),
    ]
    if mixed_cls:
        lanes.append(cls_val.astype(jnp.float32))
    stacked = jnp.stack(lanes, axis=-1)                         # [B, I, L]
    out = jax.lax.dot_general(
        oh, stacked, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,  # see docstring: exactness
    )                                                           # [B, O, L]
    idsp1 = out[..., 0].astype(jnp.int32)
    v2 = idsp1 > 0
    ids2 = jnp.where(v2, idsp1 - 1, num_nodes)
    if mixed_cls:
        cls2 = jnp.where(v2, out[..., 3].astype(jnp.int32), 0)
    else:
        cls2 = jnp.where(v2, cls_val, 0).astype(jnp.int32)
    ps2 = out[..., 1]
    pt2 = out[..., 2]
    n_valid = jnp.sum(valid.astype(jnp.int32), axis=1)
    dropped = jnp.maximum(n_valid - budget, 0)
    return ids2, cls2, ps2, pt2, v2, dropped


def extract_context(
    adj_rows: PaddedRows,
    ppr_rows: PaddedRows,
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    cfg: ContextConfig,
    mask_ranks: Optional[jnp.ndarray] = None,
    drop_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> ContextTables:
    """Single-device entry: gather each endpoint's rows locally, extract."""
    return extract_context_rows(
        gather_link_rows(adj_rows, ppr_rows, src,
                         with_ranks=mask_ranks is not None),
        gather_link_rows(adj_rows, ppr_rows, tgt,
                         with_ranks=mask_ranks is not None),
        cfg,
        adj_rows.num_nodes,
        mask_ranks=mask_ranks,
        drop_rng=drop_rng,
        train=train,
    )


def extract_context_rows(
    rows_s: LinkRows,
    rows_t: LinkRows,
    cfg: ContextConfig,
    num_nodes: int,
    mask_ranks: Optional[jnp.ndarray] = None,
    drop_rng: Optional[jax.Array] = None,
    train: bool = False,
) -> ContextTables:
    """Context extraction over pre-gathered per-link rows (see module
    docstring for the semantics; reference file:line cites inline)."""
    n = num_nodes
    use_mask = mask_ranks is not None

    a_n = rows_s.adj_nbrs   # [B, A] neighbors of src (sorted, pad = n)
    b_n = rows_t.adj_nbrs   # [B, A] neighbors of tgt
    all_mode = cfg.mask_mode == "all"
    p_n = rows_s.ppr_nbrs if all_mode else None   # [B, P] ppr support of src

    # Lookups against the SAME row set are batched into one compare-all
    # call (concatenated queries, split after): the r4 trace showed the
    # extraction wall dominated by per-op launch gaps between many small
    # fused reduces, not by the reduces themselves.
    def _multi(fn, rows, query_list):
        if len(query_list) == 1:
            return [fn(rows, query_list[0])]
        v = fn(rows, jnp.concatenate(query_list, axis=1))
        outs, off = [], 0
        for q_ in query_list:
            outs.append(v[:, off:off + q_.shape[1]])
            off += q_.shape[1]
        return outs

    # --- CN / 1-hop classification over the union (reference :232-237),
    #     with per-batch positive-edge masking in edge-rank space
    #     (reference train_model.py:38-45) ---
    in_a_flags = all_mode and rows_s.ppr_flags is not None
    in_a_raw = rows_s.ppr_flags if in_a_flags else None
    in_b_raw = None
    if use_mask:
        ranks_a = rows_s.adj_ranks           # rank of edge (src, v)
        ranks_b = rows_t.adj_ranks           # rank of edge (tgt, v)
        a_cols = ranks_a.shape[1]
        hits = masking.rank_is_masked(
            mask_ranks, jnp.concatenate([ranks_a, ranks_b], axis=1)
        )                                    # one bitmap pass, not two
        hit_a, hit_b = hits[:, :a_cols], hits[:, a_cols:]
        valid_a = (a_n < n) & ~hit_a
        valid_b = (b_n < n) & ~hit_b
        # Membership against the *masked* opposite row: entries whose
        # own edge is batch-masked are remapped to the pad id first, so
        # "v in masked N(tgt)" is a plain 1-lane membership instead of
        # membership + a 2-lane cross-edge rank lookup checked against
        # the bitmap afterwards (saves 2 of 4 bitmap row-gathers and
        # 2/3 of these dots' reduce lanes; measured r4, identical
        # semantics — a pad query only ever matches remapped pad
        # entries, and those query slots are dropped by valid_a/b).
        a_eff = jnp.where(hit_a, n, a_n)
        b_eff = jnp.where(hit_b, n, b_n)
        # both directions in ONE batch-stacked dot (same cell count,
        # half the op launches — extraction walls are gap-sensitive).
        # The axis-0 stacking requires src/tgt adjacency rows to share
        # one cap width A — true today (both gathered from the same
        # padded table); an asymmetric-cap caller must split the dots.
        assert a_eff.shape == b_eff.shape and a_n.shape == b_n.shape, (
            f"batch-stacked membership needs equal adjacency caps, got "
            f"{a_eff.shape} vs {b_eff.shape}")
        both = row_contains(
            jnp.concatenate([b_eff, a_eff], axis=0),
            jnp.concatenate([a_n, b_n], axis=0),
        )
        bsz = a_n.shape[0]
        a_in_tgt, b_in_src = both[:bsz], both[bsz:]
        if all_mode:
            # deliberately UNMASKED rows here (reference NOTE :438-441)
            if not in_a_flags:
                in_a_raw = row_contains(a_n, p_n)
            in_b_raw = row_contains(b_n, p_n)
    else:
        valid_a = a_n < n
        valid_b = b_n < n
        # group by row set: [queries in N(tgt)] and [queries in N(src)]
        bq = [a_n] + ([p_n] if all_mode else [])
        bres = _multi(row_contains, b_n, bq)
        a_in_tgt = bres[0]
        if all_mode:
            in_b_raw = bres[1]
        aq = [b_n] + ([p_n] if all_mode and not in_a_flags else [])
        ares = _multi(row_contains, a_n, aq)
        b_in_src = ares[0]
        if all_mode and not in_a_flags:
            in_a_raw = ares[1]

    cn_a = valid_a & a_in_tgt                  # CNs (counted on src half)
    onehop_a = valid_a & ~a_in_tgt             # 1-hop via src only
    onehop_b = valid_b & ~b_in_src             # 1-hop via tgt only (dedup CN)

    # --- PPR value lookups (reference get_ppr_vals :279-319) ---
    # self-side values ppr(u, N(u)) are host-precomputed on the adjacency
    # rows; only the cross values need a per-batch lookup
    def _lookup(rows: LinkRows, queries):
        # value-only: no membership lane (absent -> 0.0, pad vals are 0)
        return row_lookup_value(rows.ppr_nbrs, rows.ppr_vals, queries)

    have_self = rows_s.adj_vals is not None
    tq = [a_n] + ([] if have_self else [b_n]) + ([p_n] if all_mode else [])
    tres = _multi(_lookup, rows_t, tq)
    pt_a = tres[0]
    pt_b = rows_t.adj_vals if have_self else tres[1]
    pt_n = tres[-1] if all_mode else None
    sq = [b_n] + ([] if have_self else [a_n])
    sres = _multi(_lookup, rows_s, sq)
    ps_b = sres[0]
    ps_a = rows_s.adj_vals if have_self else sres[1]

    # --- threshold filters (reference :241-250) ---
    thr_cn, thr_1h = cfg.thresh_cn, cfg.thresh_1hop
    cn_a &= (ps_a >= thr_cn) & (pt_a >= thr_cn)
    if cfg.mask_mode != "cn":
        onehop_a &= (ps_a >= thr_1h) & (pt_a >= thr_1h)
        onehop_b &= (ps_b >= thr_1h) & (pt_b >= thr_1h)

    # --- >1-hop ("all" mode only; reference get_non_1hop_ppr :434-481) ---
    if all_mode:
        # in_a_raw / in_b_raw: membership in the UNMASKED adjacency on
        # purpose (reference NOTE at :438-441); "own support in own
        # neighborhood" (in_a_raw) is host-precomputed when flags exist
        ps_n = rows_s.ppr_vals
        thr_n1 = cfg.thresh_non1hop
        non1 = (
            (p_n < n)
            & (pt_n > 0.0)
            & ~in_a_raw
            & ~in_b_raw
            & (ps_n >= thr_n1)
            & (pt_n >= thr_n1)
        )
    else:
        ps_n = pt_n = non1 = None

    # --- attention dropout = context subsampling (reference :256-260) ---
    if train and cfg.att_drop > 0 and drop_rng is not None:
        k1, k2, k3, k4 = jax.random.split(drop_rng, 4)
        keep = 1.0 - cfg.att_drop
        cn_a &= jax.random.bernoulli(k1, keep, cn_a.shape)
        if cfg.mask_mode != "cn":
            onehop_a &= jax.random.bernoulli(k2, keep, onehop_a.shape)
            onehop_b &= jax.random.bernoulli(k3, keep, onehop_b.shape)
        if non1 is not None:
            non1 &= jax.random.bernoulli(k4, keep, non1.shape)

    # --- structure counts, pre-truncation (reference :340-386) ---
    num_cns = jnp.sum(cn_a, axis=1).astype(jnp.float32)
    if cfg.mask_mode != "cn":
        num_1hop = (
            jnp.sum(onehop_a, axis=1) + jnp.sum(onehop_b, axis=1)
        ).astype(jnp.float32)
    else:
        num_1hop = jnp.zeros_like(num_cns)
    if non1 is not None:
        num_non1hop = jnp.sum(non1, axis=1).astype(jnp.float32)
    else:
        num_non1hop = jnp.zeros_like(num_cns)
    num_neighbors = num_cns + num_1hop
    counts = jnp.stack([num_cns, num_1hop, num_non1hop, num_neighbors], -1)

    if cfg.budget_combined is not None:
        # --- ONE cross-class compaction into the combined table ---
        # The raw candidate segments are class-disjoint by construction
        # (cn on the src row; 1-hop-via-tgt excludes b_in_src; >1-hop
        # excludes both 1-hop neighborhoods), so a single concatenated
        # pass with a per-slot cls lane produces exactly the union of
        # the per-class sets — with global top-by-(ppr_s + ppr_t)
        # retention under budget pressure instead of per-class budgets.
        segs = [(a_n, ps_a, pt_a, cn_a, 2)]
        if cfg.mask_mode != "cn":
            segs.append((a_n, ps_a, pt_a, onehop_a, 1))
            segs.append((b_n, ps_b, pt_b, onehop_b, 1))
        if cfg.mask_mode == "all":
            segs.append((p_n, ps_n, pt_n, non1, 3))
        ids_all = jnp.concatenate([s[0] for s in segs], axis=1)
        ps_all = jnp.concatenate([s[1] for s in segs], axis=1)
        pt_all = jnp.concatenate([s[2] for s in segs], axis=1)
        v_all = jnp.concatenate([s[3] for s in segs], axis=1)
        cls_all = jnp.concatenate(
            [jnp.full(s[0].shape, s[4], jnp.int32) for s in segs], axis=1
        )
        ids2, cls2, ps2, pt2, v2, dropped = _compact(
            ids_all, cls_all, ps_all, pt_all, v_all,
            cfg.budget_combined, n,
        )
        return ContextTables(
            ids=ids2, cls=cls2, src_ppr=ps2, tgt_ppr=pt2, valid=v2,
            counts=counts, overflow=dropped,
        )

    # --- compaction to per-class budgets ---
    blocks = []
    over = jnp.zeros(a_n.shape[0], dtype=jnp.int32)
    c = _compact(a_n, jnp.int32(2), ps_a, pt_a, cn_a, cfg.budget_cn, n)
    blocks.append(c[:5])
    over += c[5]
    if cfg.mask_mode != "cn":
        ids_1h = jnp.concatenate([a_n, b_n], axis=1)
        ps_1h = jnp.concatenate([ps_a, ps_b], axis=1)
        pt_1h = jnp.concatenate([pt_a, pt_b], axis=1)
        v_1h = jnp.concatenate([onehop_a, onehop_b], axis=1)
        c = _compact(ids_1h, jnp.int32(1), ps_1h, pt_1h, v_1h,
                     cfg.budget_onehop, n)
        blocks.append(c[:5])
        over += c[5]
    if cfg.mask_mode == "all":
        c = _compact(p_n, jnp.int32(3), ps_n, pt_n, non1,
                     cfg.budget_non1hop, n)
        blocks.append(c[:5])
        over += c[5]

    cat = lambda i: jnp.concatenate([b[i] for b in blocks], axis=1)  # noqa: E731
    return ContextTables(
        ids=cat(0),
        cls=cat(1),
        src_ppr=cat(2),
        tgt_ppr=cat(3),
        valid=cat(4),
        counts=counts,
        overflow=over,
    )
