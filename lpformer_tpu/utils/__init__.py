from lpformer_tpu.utils.logger import ResultsLogger  # noqa: F401
from lpformer_tpu.utils import checkpoint  # noqa: F401
