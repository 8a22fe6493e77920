from lpformer_tpu.ops.pallas.attention import fused_link_attention  # noqa: F401
