"""Minimal MessagePassing base class with PyG dispatch semantics for the
reference's LinkAttention (src/modules/layers.py:88-224):

* ``flow`` decides which edge_index row is ``i`` vs ``j``:
  source_to_target -> (i, j) = (1, 0); target_to_source -> (0, 1).
* ``_i``/``_j``-suffixed message args lift ``kwargs[name[:-2]]``:
  tuples pick element ``dim`` (i or j), then ``index_select(node_dim,
  edge_index[dim])``; the *other* tuple element defines size[1-dim].
* special args: ``index`` = edge_index[i]; ``ptr`` = None;
  ``size_i`` = size[i] (falling back to max index + 1).
* aggregate: scatter-add over ``index`` into ``size_i`` rows (default
  aggr="add" along ``node_dim``).
"""
import inspect

import torch


class MessagePassing(torch.nn.Module):
    def __init__(self, aggr="add", flow="source_to_target", node_dim=-2,
                 **kwargs):
        super().__init__()
        assert flow in ("source_to_target", "target_to_source")
        self.aggr = aggr
        self.flow = flow
        self.node_dim = node_dim

    def propagate(self, edge_index, size=None, **kwargs):
        i, j = (1, 0) if self.flow == "source_to_target" else (0, 1)
        size = [None, None] if size is None else list(size)
        params = inspect.signature(self.message).parameters
        msg_kwargs = {}
        for name in params:
            if name.endswith("_i") or name.endswith("_j"):
                dim = i if name.endswith("_i") else j
                data = kwargs.get(name[:-2])
                if isinstance(data, (tuple, list)):
                    assert len(data) == 2
                    other = data[1 - dim]
                    if torch.is_tensor(other):
                        size[1 - dim] = other.size(self.node_dim)
                    data = data[dim]
                if torch.is_tensor(data):
                    size[dim] = data.size(self.node_dim)
                    data = data.index_select(self.node_dim, edge_index[dim])
                msg_kwargs[name] = data
            elif name == "index":
                msg_kwargs[name] = edge_index[i]
            elif name == "ptr":
                msg_kwargs[name] = None
            elif name == "size_i":
                pass  # filled below once sizes are known
            elif name in kwargs:
                msg_kwargs[name] = kwargs[name]
        size_i = size[i]
        if size_i is None:
            size_i = int(edge_index[i].max()) + 1 if edge_index.numel() else 0
        if "size_i" in params:
            msg_kwargs["size_i"] = size_i
        out = self.message(**msg_kwargs)
        return self.aggregate(out, edge_index[i], dim_size=size_i)

    def aggregate(self, inputs, index, dim_size):
        assert self.aggr == "add"
        dim = self.node_dim
        if dim < 0:
            dim = inputs.dim() + dim
        shape = list(inputs.shape)
        shape[dim] = dim_size
        out = torch.zeros(shape, dtype=inputs.dtype, device=inputs.device)
        return out.index_add(dim, index, inputs)

    def message(self, x_j):  # pragma: no cover - always overridden
        return x_j
