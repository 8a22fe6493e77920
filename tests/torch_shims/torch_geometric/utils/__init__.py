"""Segment softmax with PyG semantics (group max subtraction, +1e-16 in
the denominator) — the attention normalizer at reference
src/modules/layers.py:220."""
import torch


def softmax(src, index, ptr=None, num_nodes=None, dim=0):
    if num_nodes is None:
        num_nodes = int(index.max()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = num_nodes
    view = [1] * src.dim()
    view[dim] = -1
    idx = index.view(view).expand_as(src)
    m = torch.full(shape, float("-inf"), dtype=src.dtype).scatter_reduce(
        dim, idx, src, "amax", include_self=True
    )
    m = m.gather(dim, idx)
    # empty groups never gathered; guard -inf - -inf
    out = (src - m).exp()
    denom = torch.zeros(shape, dtype=src.dtype).scatter_add(dim, idx, out)
    return out / (denom.gather(dim, idx) + 1e-16)
