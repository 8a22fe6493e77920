from lpformer_tpu.data.dataset import LinkPredDataset, build_graph_bundle  # noqa: F401
from lpformer_tpu.data import synthetic  # noqa: F401
