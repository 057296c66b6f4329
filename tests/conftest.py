"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding tests run against a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), as real multi-chip TPU hardware is not
available in CI. The environment pins JAX_PLATFORMS=axon (TPU tunnel), so the
platform must be overridden through jax.config before any backend init.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

# persistent XLA compilation cache: the suite is compile-dominated (the two
# checkpoint/resume tests alone build several trainer graphs); repeat runs
# drop from ~35 to a few minutes once the cache is warm
from adsr_tpu.core.runtime import setup_compilation_cache  # noqa: E402

setup_compilation_cache()
