"""GCNConv with PyG's SparseTensor-branch semantics, computed densely
(tiny graphs only): gcn_norm = fill_diag(A, 1) then D^-1/2 A D^-1/2 with
row-degree sums; forward = A_norm @ (x @ W) + bias. Parameter names match
PyG (``lin.weight`` + ``bias``) so interop's exported state dicts load
strict (reference GCN: src/models/other_models.py:35-48)."""
import torch

from .dense.linear import Linear
from .inits import zeros


def _gcn_norm_dense(A, add_self_loops=True, fill_value=1.0):
    A = A.clone()
    if add_self_loops:
        # torch_sparse.fill_diag SETS the diagonal (replacing existing
        # entries), unlike edge_index-mode add_self_loops which appends
        A.fill_diagonal_(float(fill_value))
    deg = A.sum(dim=1)
    dinv = deg.pow(-0.5)
    dinv.masked_fill_(dinv == float("inf"), 0.0)
    return dinv.view(-1, 1) * A * dinv.view(1, -1)


class GCNConv(torch.nn.Module):
    def __init__(self, in_channels, out_channels, cached=False,
                 normalize=True, add_self_loops=True, bias=True):
        super().__init__()
        self.normalize = normalize
        self.cached = bool(cached)
        self.add_self_loops = add_self_loops
        self._cached_adj = None
        self.lin = Linear(in_channels, out_channels, bias=False,
                          weight_initializer="glorot")
        if bias:
            self.bias = torch.nn.Parameter(torch.empty(out_channels))
            zeros(self.bias)
        else:
            self.register_parameter("bias", None)

    def reset_parameters(self):
        self.lin.reset_parameters()
        zeros(self.bias)
        self._cached_adj = None

    def forward(self, x, adj_t):
        A = adj_t.to_dense() if hasattr(adj_t, "to_dense") else adj_t
        if A.is_sparse:
            A = A.to_dense()
        if self.normalize:
            if self.cached and self._cached_adj is not None:
                A = self._cached_adj
            else:
                A = _gcn_norm_dense(A, self.add_self_loops)
                if self.cached:
                    self._cached_adj = A
        x = self.lin(x)
        out = A @ x
        if self.bias is not None:
            out = out + self.bias
        return out
