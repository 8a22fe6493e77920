"""Model configuration.

One frozen dataclass covering the reference's ``train_args`` dict
(reference: src/run.py:122-143) plus the TPU-specific static budgets.
"""
from __future__ import annotations

import dataclasses

from lpformer_tpu.ops.context import ContextConfig


@dataclasses.dataclass(frozen=True)
class LPFormerConfig:
    dim: int = 128
    num_heads: int = 1
    gnn_layers: int = 2
    trans_layers: int = 1
    pred_layers: int = 2

    thresh_cn: float = 0.0
    thresh_1hop: float = 1e-2
    thresh_non1hop: float = 1e-2

    residual: bool = False
    layer_norm: bool = True
    relu: bool = True

    dropout: float = 0.2      # post-attention dropout in the transformer layer
    gnn_drop: float = 0.2
    att_drop: float = 0.1     # context-node subsampling rate
    feat_drop: float = 0.0
    pred_drop: float = 0.0

    # "bfloat16" runs every matmul with bf16 inputs + f32 accumulation
    # (the TPU-native precision; parity tests use float32). Note that
    # even in "float32" mode, DENSE-layer matmuls run at the backend's
    # default matmul precision (on TPU: one bf16 pass per product —
    # the TPU analog of CUDA TF32); set JAX_DEFAULT_MATMUL_PRECISION=
    # highest for bit-faithful f32 dense layers. Exactness-dependent
    # ops (id/rank lookups, compaction, SpMM accumulation) pin their
    # own precision and are exact regardless of this setting.
    matmul_dtype: str = "float32"

    # fused Pallas PE+attention kernel (ops/pallas/pe_attention.py) for
    # the pairwise block, train AND eval. None = auto: on when running
    # on TPU with num_heads == 1 and tile-aligned class budgets
    # (measured 132.6 -> 91.8 ms/step on the v5e collab-like bench).
    # True forces it (falls back if ineligible), False forces the XLA
    # dense-masked path.
    use_pallas_attention: "bool | None" = None

    # rematerialize the per-link pairwise block (context keys + attention)
    # in backward: trades recompute for not holding the [B, C, 2*dim]
    # activations — needed for high-degree configs (ddi-like) where those
    # tensors are multi-GB. None = auto (remat when the estimated
    # activation footprint exceeds 2 GB — calibrated by the ppa-like
    # preset OOM'ing a 16 GB chip at a 3 GB threshold)
    remat_pairwise: "bool | None" = None

    # static per-class context budgets (TPU shape caps; set to the padded
    # row caps for exact reference behavior)
    budget_cn: int = 128
    budget_onehop: int = 256
    budget_non1hop: int = 128
    # combined (class-tagged) context table: one cross-class budget
    # replacing the per-class blocks. Class-count tails do not stack, so
    # a total-tail-sized combined table carries the same context sets in
    # far fewer static slots — the [B, C] width drives the key gather,
    # the fused attention kernel, and its scatter VJP. None = classic
    # per-class blocks (see ops/context.ContextConfig.budget_combined)
    budget_combined: "int | None" = None

    @property
    def mm_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.matmul_dtype == "bfloat16" else None

    @property
    def mask_mode(self) -> str:
        return self.context.mask_mode

    @property
    def context(self) -> ContextConfig:
        # ContextConfig.from_thresholds owns the threshold -> mode
        # decision table (a threshold of 1 excludes that node class)
        return ContextConfig.from_thresholds(
            thresh_cn=self.thresh_cn,
            thresh_1hop=self.thresh_1hop,
            thresh_non1hop=self.thresh_non1hop,
            budget_cn=self.budget_cn,
            budget_onehop=self.budget_onehop,
            budget_non1hop=self.budget_non1hop,
            att_drop=self.att_drop,
            budget_combined=self.budget_combined,
        )

    @property
    def count_dim(self) -> int:
        return self.context.count_dim

    @property
    def out_dim(self) -> int:
        # elementwise dim + pairwise dim (reference link_transformer.py:50)
        return self.dim * 2
