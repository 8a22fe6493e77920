"""Dense tiny-graph stand-in for the torch_geometric surface the
reference imports (see tests/torch_shims/README.md)."""
