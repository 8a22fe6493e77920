"""Sharded evaluation context: everything the eval harnesses need to
score over a live (data x graph) mesh instead of a single device.

The reference's eval flows are single-device loops
(reference: src/train/testing.py:14-121); here the same harness code
(:mod:`lpformer_tpu.evalx.harness`) runs unchanged, with the propagate /
score callables swapped for mesh-sharded ones (propagate-once semantics
preserved — X_full is computed per adjacency variant and reused across
every batch)."""
from __future__ import annotations

from typing import Optional

from jax.sharding import Mesh

from lpformer_tpu.models.config import LPFormerConfig
from lpformer_tpu.parallel.partition import (
    ShardedGraph,
    partition_graph,
    place_sharded_graph,
)
from lpformer_tpu.parallel.sharded_step import (
    make_sharded_propagate,
    make_sharded_score_with_X,
)


class ShardedEvalContext:
    """Holds the partitioned graph variants and compiled sharded
    propagate/score callables for the eval harnesses.

    ``prop(params, sg) -> X_full``; ``score(params, sg, X, src, tgt) ->
    scores`` — signature-compatible with the harness's single-device
    callables (the ``graph`` argument is a ShardedGraph here)."""

    def __init__(
        self,
        cfg: LPFormerConfig,
        mesh: Mesh,
        ds,
        sg_train: Optional[ShardedGraph] = None,
        context_parallel: bool = False,
    ):
        d = mesh.shape["data"]
        g = mesh.shape["graph"]
        self.mesh = mesh
        self.ndev = d * g
        self.link_dev = d if context_parallel else d * g
        self.sg = (
            sg_train
            if sg_train is not None
            else place_sharded_graph(partition_graph(ds.graph, g=g, d=d), mesh)
        )
        if ds.graph_test is ds.graph:
            self.sg_test = self.sg
        else:
            self.sg_test = place_sharded_graph(
                partition_graph(ds.graph_test, g=g, d=d), mesh
            )
        self.prop = make_sharded_propagate(
            cfg, mesh, ds.num_nodes, self.sg.rows_per_shard
        )
        self.score, self.score_group = make_sharded_score_with_X(
            cfg, mesh, ds.num_nodes, self.sg.ctx_rows_per_shard,
            context_parallel=context_parallel,
        )
