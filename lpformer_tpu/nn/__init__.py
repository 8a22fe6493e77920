from lpformer_tpu.nn.core import (  # noqa: F401
    dropout,
    layer_norm_apply,
    layer_norm_init,
    linear_apply,
    linear_init,
    mlp_apply,
    mlp_init,
)
