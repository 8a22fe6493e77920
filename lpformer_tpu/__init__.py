"""lpformer_tpu — a TPU-native graph message-passing + link-prediction framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the LPFormer
reference (HarryShomer/LPFormer: adaptive graph transformer for link
prediction, KDD'24). Not a port: all graph state is static padded-CSR /
bucketed-table artifacts built in a preprocessing pass, and every training /
eval step is a fixed-shape jitted program that maps onto the TPU's MXU/VPU.

Layering (bottom-up):
  graph/     static graph containers (CSR + padded rows) and preprocessing
  ops/       compute kernels: SpMM, segment softmax, context extraction
  nn/        functional NN primitives (Linear/LayerNorm/MLP/dropout)
  models/    GCN encoder, LinkTransformer, score heads
  parallel/  device meshes, sharded train steps (DP x graph partition)
  train/     jitted train step, trainer loop, optimizer, checkpointing
  evalx/     on-device Hits@K / MRR and the evaluation harnesses
  data/      dataset readers (planetoid/HeaRT/OGB-format) + synthetic graphs
  cli/       flag-compatible runner (mirrors reference src/run.py flags)
"""

__version__ = "0.1.0"

from lpformer_tpu.graph.containers import CSRGraph, PaddedRows, GraphBundle  # noqa: F401
