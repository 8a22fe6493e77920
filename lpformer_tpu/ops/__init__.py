from lpformer_tpu.ops import context, masking, segment, spmm  # noqa: F401
