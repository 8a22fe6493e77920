"""Host-side graph partitioning for the (data x graph) mesh.

Propagation state: edges are partitioned by destination row into
``graph`` shards (each device aggregates into its own node-row shard),
and each shard's edge list is further split across the ``data`` axis so
the SpMM work uses the whole mesh — partial sums are combined with a
psum over 'data'. All blocks are padded to a common static length with
zero-weight edges.

Context state (adj/PPR padded rows — the memory giant at citation2
scale: 2.9M x 256 PPR rows plus values/flags is several GB): row-sharded
over the FULL flattened (data, graph) mesh, so each device holds N/ndev
rows. Per batch, each device's link endpoints' rows are fetched with an
all_gather (ids, tiny) + owner-gather + psum_scatter (payload) exchange
in :mod:`lpformer_tpu.parallel.sharded_step` — the rows never exist
replicated. (The reference is single-device and keeps the whole sparse
PPR matrix resident: src/util/read_datasets.py:121-129; its README
notes citation2 needs >32GB. Row-sharding is the TPU-native answer.)

GCN normalization is precomputed here (the adjacency is static during
sharded training), so the per-step program is pure gather/matmul/psum.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph.containers import GraphBundle


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "x",
        "edge_src",
        "edge_dst_local",
        "edge_w",
        "diag",
        "edge_rank",
        "edge_bin",
        "adj_nbrs",
        "adj_vals",
        "adj_ranks",
        "ppr_nbrs",
        "ppr_vals",
        "ppr_flags",
    ],
    meta_fields=[
        "num_nodes", "num_nodes_padded", "rows_per_shard",
        "ctx_rows_per_shard", "adj_cap", "ppr_cap", "g", "d",
    ],
)
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Static sharded graph state.

    Propagation (sharded over 'graph', split over 'data'):
      x:              [N_pad, F]    node features (row-sharded over 'graph')
      edge_src:       [G, D, E_blk] global source ids per block
      edge_dst_local: [G, D, E_blk] destination row LOCAL to the graph shard
      edge_w:         [G, D, E_blk] normalized weights (0 = padding)
      diag:           [N_pad]       normalized self-loop coefficients
      edge_rank:      [G, D, E_blk] int32 global train-edge rank per edge
                                    (pad = -1; only under mask_input)
      edge_bin:       [G, D, E_blk] f32 binarized weight (1 = real edge;
                                    only under mask_input — the masked
                                    propagation adjacency is UNWEIGHTED,
                                    reference train_model.py:51-53)

    Context extraction (row-sharded over the FLATTENED (data, graph) mesh;
    row block k of ndev belongs to the device with linear index k where
    linear = data_index * G + graph_index):
      adj_nbrs:  [Nc_pad, A] int32   sorted neighbor ids (pad = num_nodes)
      adj_vals:  [Nc_pad, A] f32     self-PPR ppr(u, N(u)) (or None)
      adj_ranks: [Nc_pad, A] int32   train-edge ranks (or None)
      ppr_nbrs:  [Nc_pad, P] int32   sorted PPR support (pad = num_nodes)
      ppr_vals:  [Nc_pad, P] f32     ppr values
      ppr_flags: [Nc_pad, P] bool    "in unmasked 1-hop of row node" (or None)
    """

    x: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst_local: jnp.ndarray
    edge_w: jnp.ndarray
    diag: jnp.ndarray
    edge_rank: Optional[jnp.ndarray]
    edge_bin: Optional[jnp.ndarray]
    adj_nbrs: jnp.ndarray
    adj_vals: Optional[jnp.ndarray]
    adj_ranks: Optional[jnp.ndarray]
    ppr_nbrs: jnp.ndarray
    ppr_vals: jnp.ndarray
    ppr_flags: Optional[jnp.ndarray]
    num_nodes: int
    num_nodes_padded: int
    rows_per_shard: int
    ctx_rows_per_shard: int
    adj_cap: int
    ppr_cap: int
    g: int
    d: int


def _pad_rows(arr: Optional[jnp.ndarray], n_pad: int, fill) -> Optional[jnp.ndarray]:
    if arr is None:
        return None
    a = np.asarray(arr)
    if a.shape[0] == n_pad:
        return jnp.asarray(a)
    out = np.full((n_pad, a.shape[1]), fill, dtype=a.dtype)
    out[: a.shape[0]] = a
    return jnp.asarray(out)


def partition_graph(
    bundle: GraphBundle, g: int, d: int, pad_multiple: int = 8,
    mask_input: bool = False,
) -> ShardedGraph:
    """Partition a GraphBundle for a (data=d, graph=g) mesh.

    ``mask_input=True`` additionally blocks out per-edge train ranks and
    binarized weights (~E*8 bytes) so the sharded step can rebuild the
    batch-masked, renormalized propagation adjacency in-jit (the mesh
    analog of the single-device ``--mask-input`` path)."""
    n = bundle.num_nodes
    src = np.asarray(bundle.edge_src)
    dst = np.asarray(bundle.edge_dst)
    w = np.asarray(bundle.edge_w)

    # normalized weights + diag, once (gcn_norm_device semantics)
    deg = np.zeros(n, np.float64)
    np.add.at(deg, dst, w)
    deg = deg + 1.0
    dinv = np.where(deg > 0, 1.0 / np.sqrt(deg), 0.0)
    w_norm = (dinv[src] * w * dinv[dst]).astype(np.float32)
    diag = (dinv * dinv).astype(np.float32)

    rows_per = -(-n // (g * pad_multiple)) * pad_multiple
    n_pad = rows_per * g

    x = np.asarray(bundle.x)
    x_pad = np.zeros((n_pad, x.shape[1]), x.dtype)
    x_pad[:n] = x
    diag_pad = np.zeros(n_pad, np.float32)
    diag_pad[:n] = diag

    rank = None
    if mask_input:
        rank = np.asarray(bundle.edge_rank)
        assert rank is not None and rank.shape == src.shape, (
            "mask_input partitioning needs bundle.edge_rank"
        )
    shard_of = dst // rows_per
    blocks = []
    for i in range(g):
        m = shard_of == i
        bs, bd, bw = src[m], dst[m] - i * rows_per, w_norm[m]
        br = rank[m] if mask_input else None
        bb = (w[m] > 0).astype(np.float32) if mask_input else None
        # contiguous split across the data axis (keeps dst-sortedness)
        cuts = np.linspace(0, len(bs), d + 1).astype(np.int64)
        blocks.append(
            [
                (bs[cuts[j]:cuts[j + 1]], bd[cuts[j]:cuts[j + 1]],
                 bw[cuts[j]:cuts[j + 1]],
                 None if br is None else br[cuts[j]:cuts[j + 1]],
                 None if bb is None else bb[cuts[j]:cuts[j + 1]])
                for j in range(d)
            ]
        )
    e_blk = max(
        (len(b[0]) for row in blocks for b in row), default=1
    )
    e_blk = max(e_blk, 1)
    es = np.zeros((g, d, e_blk), np.int32)
    # Pad dst with rows_per (one past the last local row): keeps the
    # block monotonic so segment_sum's indices_are_sorted=True promise
    # holds, and out-of-range ids are dropped by num_segments=rows_per.
    ed = np.full((g, d, e_blk), rows_per, np.int32)
    ew = np.zeros((g, d, e_blk), np.float32)
    # rank pad = -1: bitmap_from_link_ranks never marks rank -1, so a
    # padded slot can never be masked out (its bin weight is 0 anyway)
    er = np.full((g, d, e_blk), -1, np.int32) if mask_input else None
    eb = np.zeros((g, d, e_blk), np.float32) if mask_input else None
    for i in range(g):
        for j in range(d):
            bs, bd, bw, br, bb = blocks[i][j]
            m = len(bs)
            es[i, j, :m] = bs
            ed[i, j, :m] = bd
            ew[i, j, :m] = bw
            if mask_input:
                er[i, j, :m] = br
                eb[i, j, :m] = bb

    # --- context rows, sharded over ALL ndev = g*d devices ---
    ndev = g * d
    ctx_rows_per = -(-n // (ndev * pad_multiple)) * pad_multiple
    nc_pad = ctx_rows_per * ndev
    adj, ppr = bundle.adj_rows, bundle.ppr_rows

    return ShardedGraph(
        x=jnp.asarray(x_pad),
        edge_src=jnp.asarray(es),
        edge_dst_local=jnp.asarray(ed),
        edge_w=jnp.asarray(ew),
        diag=jnp.asarray(diag_pad),
        edge_rank=None if er is None else jnp.asarray(er),
        edge_bin=None if eb is None else jnp.asarray(eb),
        adj_nbrs=_pad_rows(adj.nbrs, nc_pad, n),
        adj_vals=_pad_rows(adj.vals, nc_pad, 0.0),
        adj_ranks=_pad_rows(adj.ranks, nc_pad, -1),
        ppr_nbrs=_pad_rows(ppr.nbrs, nc_pad, n),
        ppr_vals=_pad_rows(ppr.vals, nc_pad, 0.0),
        ppr_flags=_pad_rows(ppr.flags, nc_pad, False),
        num_nodes=n,
        num_nodes_padded=n_pad,
        rows_per_shard=rows_per,
        ctx_rows_per_shard=ctx_rows_per,
        adj_cap=adj.cap,
        ppr_cap=ppr.cap,
        g=g,
        d=d,
    )


def sharded_graph_specs():
    """PartitionSpecs for every ShardedGraph data field (shard_map
    in_specs and device_put shardings use the same layout)."""
    from jax.sharding import PartitionSpec as P

    return ShardedGraph(
        x=P("graph", None),
        edge_src=P("graph", "data", None),
        edge_dst_local=P("graph", "data", None),
        edge_w=P("graph", "data", None),
        diag=P("graph"),
        edge_rank=P("graph", "data", None),
        edge_bin=P("graph", "data", None),
        adj_nbrs=P(("data", "graph"), None),
        adj_vals=P(("data", "graph"), None),
        adj_ranks=P(("data", "graph"), None),
        ppr_nbrs=P(("data", "graph"), None),
        ppr_vals=P(("data", "graph"), None),
        ppr_flags=P(("data", "graph"), None),
        num_nodes=0, num_nodes_padded=0, rows_per_shard=0,
        ctx_rows_per_shard=0, adj_cap=0, ppr_cap=0, g=0, d=0,
    )


def place_sharded_graph(sg: ShardedGraph, mesh) -> ShardedGraph:
    """device_put every array with its mesh sharding so the big tables
    are laid out once (a jit call with unsharded inputs would otherwise
    reshard them on every dispatch)."""
    from jax.sharding import NamedSharding

    specs = sharded_graph_specs()

    def put(arr, spec):
        if arr is None:
            return None
        return jax.device_put(arr, NamedSharding(mesh, spec))

    return dataclasses.replace(
        sg,
        **{
            f: put(getattr(sg, f), getattr(specs, f))
            for f in (
                "x", "edge_src", "edge_dst_local", "edge_w", "diag",
                "edge_rank", "edge_bin",
                "adj_nbrs", "adj_vals", "adj_ranks",
                "ppr_nbrs", "ppr_vals", "ppr_flags",
            )
        },
    )
