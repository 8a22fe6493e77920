"""Planetoid / HeaRT fixed-split reader.

Mirrors reference read_data_planetoid (reference:
src/util/read_datasets.py:153-254): TSV edge lists
``{train,valid,test}_{pos,neg}.txt``, a ``gnn_feature`` torch file with
``entity_embedding``, undirected adjacency from train edges, PPR with
alpha=0.15, and optional HeaRT per-sample negatives from ``.npy``.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np

from lpformer_tpu.data.dataset import LinkPredDataset, build_graph_bundle
from lpformer_tpu.graph import ppr as ppr_mod
from lpformer_tpu.ops import masking


def _read_pairs(path: str, skip_self_loops: bool = True) -> np.ndarray:
    out = []
    with open(path) as f:
        for line in f:
            sub, obj = line.strip().split("\t")
            sub, obj = int(sub), int(obj)
            if skip_self_loops and sub == obj:
                continue
            out.append((sub, obj))
    return np.asarray(out, dtype=np.int64)


def read_data_planetoid(
    data_name: str,
    data_dir: str = "dataset",
    heart_dir: Optional[str] = None,
    eps: float = 1e-4,
    alpha: float = 0.15,
    heart: bool = False,
    seed: int = 42,
    adj_cap: Optional[int] = None,
    ppr_cap: Optional[int] = None,
    cache_dir: Optional[str] = None,
    mask_input: bool = False,
) -> LinkPredDataset:
    d = os.path.join(data_dir, data_name)
    # node count = number of distinct nodes across pos splits (:159-182)
    train_pos = _read_pairs(os.path.join(d, "train_pos.txt"))
    valid_pos = _read_pairs(os.path.join(d, "valid_pos.txt"))
    test_pos = _read_pairs(os.path.join(d, "test_pos.txt"))
    node_set = set()
    for arr in (train_pos, valid_pos, test_pos):
        node_set.update(arr.reshape(-1).tolist())
    # self-loop endpoints still count as nodes (reference adds to node_set
    # before the self-loop skip, :168-174); the sets above already include
    # both endpoints of every line read.
    num_nodes = len(node_set)
    valid_neg = _read_pairs(
        os.path.join(d, "valid_neg.txt"), skip_self_loops=False
    )
    test_neg = _read_pairs(
        os.path.join(d, "test_neg.txt"), skip_self_loops=False
    )

    import torch

    feats = torch.load(
        os.path.join(d, "gnn_feature"), map_location="cpu",
        weights_only=False,
    )["entity_embedding"].numpy().astype(np.float32)

    # undirected edge_index from train pos (:197-198)
    src = np.concatenate([train_pos[:, 0], train_pos[:, 1]])
    dst = np.concatenate([train_pos[:, 1], train_pos[:, 0]])

    ppr_csr = ppr_mod.get_ppr(
        data_name, src, dst, num_nodes, alpha, eps, False,
        cache_dir=cache_dir,
    )
    uniq, _ = masking.train_edge_info(
        train_pos[:, 0], train_pos[:, 1], num_nodes
    )
    graph = build_graph_bundle(
        feats, src, dst, None, num_nodes, ppr_csr,
        adj_cap=adj_cap, ppr_cap=ppr_cap, symmetrize=True,
        mask_uniq_keys=uniq, mask_input=mask_input,
    )

    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(train_pos))[: len(valid_pos)]

    if heart:
        hd = heart_dir or os.path.join(data_dir, "heart")
        with open(os.path.join(hd, data_name, "heart_valid_samples.npy"), "rb") as f:
            valid_neg = np.load(f)
        with open(os.path.join(hd, data_name, "heart_test_samples.npy"), "rb") as f:
            test_neg = np.load(f)

    return LinkPredDataset(
        name=data_name,
        num_nodes=num_nodes,
        graph=graph,
        graph_test=graph,
        train_pos=train_pos,
        train_pos_val=train_pos[idx],
        valid_pos=valid_pos,
        valid_neg=valid_neg,
        test_pos=test_pos,
        test_neg=test_neg,
        metric="MRR",
        heart=heart,
    )
