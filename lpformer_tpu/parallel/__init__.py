from lpformer_tpu.parallel.mesh import make_mesh  # noqa: F401
from lpformer_tpu.parallel.partition import ShardedGraph, partition_graph  # noqa: F401
from lpformer_tpu.parallel.sharded_step import (  # noqa: F401
    make_sharded_loss,
    make_sharded_score,
    make_sharded_train_step,
)
