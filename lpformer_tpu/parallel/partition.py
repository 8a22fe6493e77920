"""Host-side graph partitioning for the (data x graph) mesh.

Edges are partitioned by destination row into ``graph`` shards (each
device aggregates into its own node-row shard), and each shard's edge
list is further split across the ``data`` axis so the SpMM work uses the
whole mesh — partial sums are combined with a psum over 'data'. All
blocks are padded to a common static length with zero-weight edges.

GCN normalization is precomputed here (the adjacency is static during
sharded training), so the per-step program is pure gather/matmul/psum.
"""
from __future__ import annotations

import dataclasses
from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from lpformer_tpu.graph.containers import GraphBundle, PaddedRows


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "x",
        "edge_src",
        "edge_dst_local",
        "edge_w",
        "diag",
        "adj_rows",
        "ppr_rows",
    ],
    meta_fields=["num_nodes", "num_nodes_padded", "rows_per_shard", "g", "d"],
)
@dataclasses.dataclass(frozen=True)
class ShardedGraph:
    """Static sharded graph state.

    x:              [N_pad, F]    node features (row-sharded over 'graph')
    edge_src:       [G, D, E_blk] global source ids per block
    edge_dst_local: [G, D, E_blk] destination row LOCAL to the graph shard
    edge_w:         [G, D, E_blk] normalized weights (0 = padding)
    diag:           [N_pad]       normalized self-loop coefficients
    adj_rows/ppr_rows: replicated context-extraction state
    """

    x: jnp.ndarray
    edge_src: jnp.ndarray
    edge_dst_local: jnp.ndarray
    edge_w: jnp.ndarray
    diag: jnp.ndarray
    adj_rows: PaddedRows
    ppr_rows: PaddedRows
    num_nodes: int
    num_nodes_padded: int
    rows_per_shard: int
    g: int
    d: int


def partition_graph(
    bundle: GraphBundle, g: int, d: int, pad_multiple: int = 8
) -> ShardedGraph:
    """Partition a GraphBundle for a (data=d, graph=g) mesh."""
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

    shard_of = dst // rows_per
    blocks = []
    for i in range(g):
        m = shard_of == i
        bs, bd, bw = src[m], dst[m] - i * rows_per, w_norm[m]
        # contiguous split across the data axis (keeps dst-sortedness)
        cuts = np.linspace(0, len(bs), d + 1).astype(np.int64)
        blocks.append(
            [
                (bs[cuts[j]:cuts[j + 1]], bd[cuts[j]:cuts[j + 1]],
                 bw[cuts[j]:cuts[j + 1]])
                for j in range(d)
            ]
        )
    e_blk = max(
        (len(b[0]) for row in blocks for b in row), default=1
    )
    e_blk = max(e_blk, 1)
    es = np.zeros((g, d, e_blk), np.int32)
    ed = np.zeros((g, d, e_blk), np.int32)
    ew = np.zeros((g, d, e_blk), np.float32)
    for i in range(g):
        for j in range(d):
            bs, bd, bw = blocks[i][j]
            m = len(bs)
            es[i, j, :m] = bs
            ed[i, j, :m] = bd
            ew[i, j, :m] = bw
    return ShardedGraph(
        x=jnp.asarray(x_pad),
        edge_src=jnp.asarray(es),
        edge_dst_local=jnp.asarray(ed),
        edge_w=jnp.asarray(ew),
        diag=jnp.asarray(diag_pad),
        adj_rows=bundle.adj_rows,
        ppr_rows=bundle.ppr_rows,
        num_nodes=n,
        num_nodes_padded=n_pad,
        rows_per_shard=rows_per,
        g=g,
        d=d,
    )
