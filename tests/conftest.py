"""Test harness config: force an 8-virtual-device CPU backend.

Must run before anything imports jax. The environment pins
JAX_PLATFORMS=axon (the TPU tunnel); tests override to CPU both via the
environment and the config API, and request 8 host devices so sharding
tests can exercise a real Mesh without TPU hardware.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
