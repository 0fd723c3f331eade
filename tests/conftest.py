"""Test configuration: force the CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual CPU mesh
(xla_force_host_platform_device_count), the no-real-cluster strategy from
SURVEY.md §4.8.  Must run before jax initializes a backend.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
