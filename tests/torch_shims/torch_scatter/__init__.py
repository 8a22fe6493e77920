"""Dense stand-in for torch_scatter (only what the reference uses:
``scatter(..., reduce="sum")`` at reference src/models/link_transformer.py:
371,383,430)."""
import torch


def scatter(src, index, dim=0, out=None, dim_size=None, reduce="sum"):
    if dim < 0:
        dim = src.dim() + dim
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = list(src.shape)
    shape[dim] = dim_size
    if out is None:
        out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    if reduce in ("sum", "add"):
        return out.index_add(dim, index, src)
    if reduce == "mean":
        tot = out.index_add(dim, index, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype).index_add(
            0, index, torch.ones(index.numel(), dtype=src.dtype)
        )
        cnt = cnt.clamp(min=1)
        view = [-1 if d == dim else 1 for d in range(tot.dim())]
        return tot / cnt.view(view)
    raise NotImplementedError(f"scatter reduce={reduce!r}")
