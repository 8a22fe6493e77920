from lpformer_tpu.evalx.metrics import (  # noqa: F401
    evaluate_hits,
    evaluate_mrr,
    get_metric_score,
    get_metric_score_citation2,
)
from lpformer_tpu.evalx import harness  # noqa: F401
