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


def sbm_edges(
    rng: np.random.Generator,
    num_nodes: int,
    num_edges: int,
    communities: int,
    intra_frac: float = 0.85,
    power: float = 1.2,
) -> np.ndarray:
    """[M, 2] planted-partition edges: with prob ``intra_frac`` both
    endpoints come from one community (round-robin assignment
    ``node % communities``), else from the global power-law endpoint
    distribution (the heavy-tail overlay that creates hub nodes and
    budget-overflow pressure). Intra edges make link structure
    LEARNABLE — intra pairs share many common neighbors — which the
    pure power-law generator lacks (its MRR floor is too low to detect
    budget-truncation damage; VERDICT r3 weak #4)."""
    k = communities
    sizes = np.array([(num_nodes - c - 1) // k + 1 for c in range(k)])
    out = []
    need = num_edges
    while need > 0:
        batch = need * 2
        intra = rng.random(batch) < intra_frac
        c = rng.integers(0, k, batch)
        j1 = (rng.random(batch) * sizes[c]).astype(np.int64)
        j2 = (rng.random(batch) * sizes[c]).astype(np.int64)
        e_in = np.stack([c + k * j1, c + k * j2], axis=1)
        e_out = random_edges(rng, num_nodes, batch, power)
        e = np.where(intra[:, None], e_in, e_out[: len(e_in)])
        e = e[e[:, 0] != e[:, 1]][:need]
        out.append(e)
        need -= len(e)
    return np.concatenate(out, axis=0).astype(np.int64)


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
    communities: int = 0,
    intra_frac: float = 0.85,
) -> LinkPredDataset:
    """``power`` shapes the endpoint degree distribution (preferential-
    attachment weight ~ rank^-power); >1 gives an ogbl-ppa-like heavy
    tail (hub nodes with huge context sets — the budget-overflow stress
    case, reference's unbounded selection:
    src/models/link_transformer.py:434-481).

    ``communities > 0`` switches to a planted-partition mixture
    (:func:`sbm_edges`): positives (train AND eval) are predominantly
    intra-community, negatives stay uniform — link structure becomes
    genuinely learnable from CN/PPR context, giving metric studies a
    base MRR high enough to detect degradation."""
    rng = np.random.default_rng(seed)
    if communities > 0:
        def pos_edges(m):
            return sbm_edges(
                rng, num_nodes, m, communities, intra_frac, power
            )
    else:
        def pos_edges(m):
            return random_edges(rng, num_nodes, m, power)
    train_pos = pos_edges(num_train)
    valid_pos = pos_edges(num_eval)
    test_pos = pos_edges(num_eval)
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
        if communities > 0:
            key += f"-k{communities}-i{intra_frac}"
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
