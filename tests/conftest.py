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


def cached_capture(key: str, builder):
    """Cache synthetic captures across test sessions (/tmp survives the
    run-to-run cycle on this host; regeneration is the dominant system-test
    wall-time — VERDICT r4 Weak #5)."""
    import pathlib

    import numpy as np

    cache = pathlib.Path("/tmp/gnss_sdr_tpu_testcache")
    cache.mkdir(exist_ok=True)
    path = cache / f"{key}.npy"
    if path.exists():
        return np.load(path)
    x = builder()
    np.save(path, x)
    return x
