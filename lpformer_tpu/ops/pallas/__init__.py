from lpformer_tpu.ops.pallas.attention import fused_link_attention  # noqa: F401
from lpformer_tpu.ops.pallas.pe_attention import (  # noqa: F401
    fused_pe_link_attention,
    pe_attention_tile,
)
