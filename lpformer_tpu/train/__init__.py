from lpformer_tpu.train.optim import make_optimizer  # noqa: F401
from lpformer_tpu.train.step import make_train_step  # noqa: F401
from lpformer_tpu.train.trainer import TrainArgs, train_data  # noqa: F401
