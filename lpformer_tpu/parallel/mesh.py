"""Device mesh construction.

Two logical axes (reference has NO parallelism — SURVEY §2.4; this layer
is new, first-class):
  * ``data``  — link-batch sharding (loss is a mean over independent
    links, reference train_model.py:61-70, so DP is natural);
  * ``graph`` — node/edge partitioning for the SpMM encoder (the
    TP-analog: each device owns a row shard of the node features and the
    edges that aggregate into those rows).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    data: Optional[int] = None,
    graph: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    n = len(devs)
    if data is None:
        data = n // graph
    assert data * graph == n, (
        f"mesh {data}x{graph} != {n} devices"
    )
    arr = np.asarray(devs).reshape(data, graph)
    return Mesh(arr, axis_names=("data", "graph"))
