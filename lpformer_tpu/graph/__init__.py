from lpformer_tpu.graph.containers import CSRGraph, PaddedRows, GraphBundle  # noqa: F401
from lpformer_tpu.graph import preprocess, ppr  # noqa: F401
