from lpformer_tpu.models.config import LPFormerConfig  # noqa: F401
from lpformer_tpu.models.link_transformer import (  # noqa: F401
    calc_pairwise,
    forward,
    init_lpformer,
    propagate,
    score_links,
)
