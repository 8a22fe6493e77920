"""Load the ACTUAL reference model in-process via tests/torch_shims.

The north star (BASELINE.md) asks for per-layer activation parity
against the PyTorch reference itself, not a re-derived oracle. This
helper makes `/root/reference/src/models/link_transformer.py` (plus
modules/layers.py, models/other_models.py) importable unmodified by
prepending the dense shim packages and the reference source root to
sys.path, and builds the reference's ``data`` dict (reference:
src/util/read_datasets.py:24-26,85-118 semantics) from the SAME
LinkPredDataset this framework consumes — identical adjacency, features
and PPR values on both sides.
"""
from __future__ import annotations

import os
import sys

import numpy as np

REF_ROOT = os.environ.get("LPFORMER_REFERENCE_SRC", "/root/reference/src")
_SHIMS = os.path.join(os.path.dirname(__file__), "torch_shims")


def reference_available() -> bool:
    return os.path.isdir(REF_ROOT)


def load_reference():
    """Returns (link_transformer, other_models, layers) reference modules."""
    for p in (REF_ROOT, _SHIMS):
        if p not in sys.path:
            sys.path.insert(0, p)
    import models.link_transformer as rlt
    import models.other_models as rom
    import modules.layers as rlayers

    return rlt, rom, rlayers


def dense_from_padded_rows(rows, num_nodes: int) -> np.ndarray:
    """[N, N] dense matrix from a PaddedRows table (pad id = num_nodes)."""
    nbrs = np.asarray(rows.nbrs)
    vals = (
        np.ones_like(nbrs, dtype=np.float64)
        if rows.vals is None
        else np.asarray(rows.vals, dtype=np.float64)
    )
    out = np.zeros((num_nodes, num_nodes + 1))
    rows_ix = np.repeat(np.arange(num_nodes), nbrs.shape[1])
    out[rows_ix, nbrs.reshape(-1)] = vals.reshape(-1)
    return out[:, :num_nodes]


def build_reference_data(ds):
    """The reference's ``data`` dict for a synthetic LinkPredDataset.

    adj_t: dense weighted symmetric adjacency (duplicate edges summed,
    like SparseTensor.from_edge_index coalescing); adj_mask: sparse-COO
    binarized 0/1 (read_datasets.py:90-95); ppr: sparse-COO built from
    the same padded PPR rows the TPU pipeline consumes.
    """
    import torch

    n = ds.num_nodes
    src, dst = ds.train_pos[:, 0], ds.train_pos[:, 1]
    A = np.zeros((n, n), dtype=np.float64)
    np.add.at(A, (np.concatenate([src, dst]), np.concatenate([dst, src])), 1.0)

    adj_t = torch.tensor(A, dtype=torch.float32)
    adj_mask = (
        torch.tensor((A > 0).astype(np.float32)).to_sparse_coo().coalesce()
    )
    ppr_dense = dense_from_padded_rows(ds.graph.ppr_rows, n)
    ppr = torch.tensor(ppr_dense, dtype=torch.float32).to_sparse_coo()
    ppr = ppr.coalesce()

    deg = torch.tensor(A.sum(axis=1), dtype=torch.float32)
    return {
        "x": torch.tensor(np.asarray(ds.graph.x), dtype=torch.float32),
        "adj_t": adj_t,
        "adj_mask": adj_mask,
        "ppr": ppr,
        "degree": deg,
    }


def make_train_args(cfg) -> dict:
    """Reference train_args dict (src/run.py:122-143) from LPFormerConfig,
    dropout zeroed (parity runs in eval mode anyway)."""
    return {
        "gcn_cache": False,
        "gnn_layers": cfg.gnn_layers,
        "trans_layers": cfg.trans_layers,
        "dim": cfg.dim,
        "num_heads": cfg.num_heads,
        "lr": 1e-3,
        "weight_decay": 0.0,
        "decay": 0.975,
        "dropout": 0.0,
        "gnn_drop": 0.0,
        "pred_dropout": 0.0,
        "att_drop": 0.0,
        "feat_drop": 0.0,
        "residual": cfg.residual,
        "layer_norm": cfg.layer_norm,
        "relu": cfg.relu,
        "mask_input": False,
        "thresh_1hop": cfg.thresh_1hop,
        "thresh_cn": cfg.thresh_cn,
        "thresh_non1hop": cfg.thresh_non1hop,
    }


def load_torch_state(module, sd: dict, strict: bool = True):
    import torch

    module.load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd.items()},
        strict=strict,
    )
