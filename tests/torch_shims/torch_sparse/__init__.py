"""Dense stand-in for torch_sparse: a minimal ``SparseTensor`` carrying a
dense [N, N] matrix. The reference model files never *construct* one —
they receive ``adj_t`` through the data dict (reference:
src/util/read_datasets.py:85) — so only the surface our shim GCNConv and
the test's data-building code touch is implemented."""
import torch

from . import matmul  # noqa: F401


class SparseTensor:
    def __init__(self, dense: torch.Tensor):
        self._d = dense

    @classmethod
    def from_dense(cls, dense):
        return cls(dense.clone())

    @classmethod
    def from_edge_index(cls, edge_index, edge_attr=None, sparse_sizes=None):
        n = sparse_sizes[0] if sparse_sizes else int(edge_index.max()) + 1
        m = sparse_sizes[1] if sparse_sizes else n
        d = torch.zeros((n, m), dtype=torch.float32)
        w = (
            edge_attr
            if edge_attr is not None
            else torch.ones(edge_index.size(1))
        )
        d.index_put_(
            (edge_index[0], edge_index[1]), w.to(d.dtype), accumulate=True
        )
        return cls(d)

    def to_dense(self):
        return self._d

    def sizes(self):
        return list(self._d.shape)

    def size(self, dim):
        return self._d.size(dim)

    def fill_diag(self, value):
        d = self._d.clone()
        d.fill_diagonal_(float(value))
        return SparseTensor(d)

    def sum(self, dim):
        return self._d.sum(dim=dim)

    def to(self, *a, **k):
        return SparseTensor(self._d.to(*a, **k))
