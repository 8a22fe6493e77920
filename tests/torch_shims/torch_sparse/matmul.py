"""spmm_* names imported (but never called) by the reference
(src/models/other_models.py:5)."""


def _dense(adj):
    return adj.to_dense() if hasattr(adj, "to_dense") else adj


def spmm_add(adj, x):
    return _dense(adj) @ x


def spmm_mean(adj, x):
    d = _dense(adj)
    deg = d.sum(dim=1, keepdim=True).clamp(min=1)
    return (d @ x) / deg


def spmm_max(adj, x):  # pragma: no cover - unused by the reference fwd
    raise NotImplementedError("spmm_max shim not implemented")
