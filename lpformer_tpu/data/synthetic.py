"""Synthetic graphs for tests and benchmarks.

Power-law-ish random graphs with the statistics that matter for this
workload (degree spread, PPR sparsity), so kernels and end-to-end steps
can be exercised and benchmarked without dataset downloads.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from lpformer_tpu.data.dataset import LinkPredDataset, build_graph_bundle
from lpformer_tpu.graph import ppr as ppr_mod


def random_edges(
    rng: np.random.Generator,
    num_nodes: int,
    num_edges: int,
    power: float = 0.8,
) -> np.ndarray:
    """[M, 2] directed edge list without self loops (duplicates allowed,
    like real OGB splits)."""
    # preferential-attachment-flavored endpoint distribution
    w = (np.arange(1, num_nodes + 1) ** -power).astype(np.float64)
    p = w / w.sum()
    src = rng.choice(num_nodes, size=num_edges * 2, p=p)
    dst = rng.choice(num_nodes, size=num_edges * 2, p=p)
    ok = src != dst
    e = np.stack([src[ok], dst[ok]], axis=1)[:num_edges]
    while len(e) < num_edges:  # top up if too many self loops
        extra = random_edges(rng, num_nodes, num_edges - len(e), power)
        e = np.concatenate([e, extra], axis=0)
    return e.astype(np.int64)


def synthetic_dataset(
    seed: int = 0,
    num_nodes: int = 200,
    num_train: int = 600,
    num_eval: int = 60,
    feat_dim: int = 16,
    alpha: float = 0.15,
    eps: float = 1e-3,
    heart: bool = False,
    heart_negs: int = 8,
    adj_cap: Optional[int] = None,
    ppr_cap: Optional[int] = None,
    metric: str = "MRR",
    ppr_cache_dir: Optional[str] = None,
    power: float = 0.8,
    mask_input: bool = False,
) -> LinkPredDataset:
    """``power`` shapes the endpoint degree distribution (preferential-
    attachment weight ~ rank^-power); >1 gives an ogbl-ppa-like heavy
    tail (hub nodes with huge context sets — the budget-overflow stress
    case, reference's unbounded selection:
    src/models/link_transformer.py:434-481)."""
    rng = np.random.default_rng(seed)
    train_pos = random_edges(rng, num_nodes, num_train, power)
    valid_pos = random_edges(rng, num_nodes, num_eval, power)
    test_pos = random_edges(rng, num_nodes, num_eval, power)
    if heart:
        valid_neg = random_edges(rng, num_nodes, num_eval * heart_negs)
        valid_neg = valid_neg.reshape(num_eval, heart_negs, 2)
        test_neg = random_edges(rng, num_nodes, num_eval * heart_negs)
        test_neg = test_neg.reshape(num_eval, heart_negs, 2)
    else:
        valid_neg = random_edges(rng, num_nodes, num_eval)
        test_neg = random_edges(rng, num_nodes, num_eval)
    x = rng.standard_normal((num_nodes, feat_dim)).astype(np.float32)

    # adjacency = symmetrized train positives (reference semantics:
    # read_datasets.py:85-95 — edge_index IS the train split)
    src, dst = train_pos[:, 0], train_pos[:, 1]
    sym_src = np.concatenate([src, dst])
    sym_dst = np.concatenate([dst, src])
    if ppr_cache_dir is not None:
        # benches rebuild the same big synthetic graphs repeatedly; the
        # push on a 1M-node graph is minutes of host time. The cache key
        # covers everything the PPR depends on (the edge list is a pure
        # function of seed/num_nodes/num_train; alpha/eps are in the
        # cached filename).
        import os as _os

        key = f"synthetic-s{seed}-n{num_nodes}-e{num_train}"
        if power != 0.8:
            key += f"-p{power}"
        ppr_csr = ppr_mod.get_ppr(
            key, sym_src, sym_dst, num_nodes, alpha, eps,
            cache_dir=_os.path.join(ppr_cache_dir, key),
        )
    else:
        ppr_csr = ppr_mod.ppr_push_csr(
            sym_src, sym_dst, num_nodes, alpha, eps
        )

    from lpformer_tpu.ops import masking as _mk
    uniq, _ = _mk.train_edge_info(src, dst, num_nodes)
    graph = build_graph_bundle(
        x, src, dst, None, num_nodes, ppr_csr,
        adj_cap=adj_cap, ppr_cap=ppr_cap, mask_uniq_keys=uniq,
        mask_input=mask_input,
    )
    idx = rng.permutation(len(train_pos))[: len(valid_pos)]
    return LinkPredDataset(
        name=f"synthetic-{num_nodes}",
        num_nodes=num_nodes,
        graph=graph,
        graph_test=graph,
        train_pos=train_pos,
        train_pos_val=train_pos[idx],
        valid_pos=valid_pos,
        valid_neg=valid_neg,
        test_pos=test_pos,
        test_neg=test_neg,
        metric=metric,
        heart=heart,
    )
