"""PyG-style Linear: same parameter names/shapes as
torch_geometric.nn.dense.linear.Linear (weight [out, in], optional bias),
glorot/zeros initializers. Used by the reference LinkAttention
(src/modules/layers.py:130-131)."""
import math

import torch
import torch.nn.functional as F

from ..inits import glorot, zeros


class Linear(torch.nn.Module):
    def __init__(self, in_channels, out_channels, bias=True,
                 weight_initializer=None, bias_initializer=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.weight_initializer = weight_initializer
        self.bias_initializer = bias_initializer
        self.weight = torch.nn.Parameter(
            torch.empty(out_channels, in_channels)
        )
        if bias:
            self.bias = torch.nn.Parameter(torch.empty(out_channels))
        else:
            self.register_parameter("bias", None)
        self.reset_parameters()

    def reset_parameters(self):
        if self.weight_initializer == "glorot":
            glorot(self.weight)
        else:
            bound = 1.0 / math.sqrt(self.in_channels)
            self.weight.data.uniform_(-bound, bound)
        if self.bias is not None:
            if self.bias_initializer == "zeros":
                zeros(self.bias)
            else:
                bound = 1.0 / math.sqrt(self.in_channels)
                self.bias.data.uniform_(-bound, bound)

    def forward(self, x):
        return F.linear(x, self.weight, self.bias)
