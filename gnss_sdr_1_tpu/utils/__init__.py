"""Shared utilities."""

from .planar import to_planar, from_planar_np, pack_complex, unpack_complex

__all__ = ["to_planar", "from_planar_np", "pack_complex", "unpack_complex",
           "enable_persistent_compilation_cache"]


def enable_persistent_compilation_cache(path: str = "/root/.cache/gnss_jax_cache"):
    """Cache compiled executables across processes — the axon remote compile
    service can take minutes per program, the cache makes reruns instant."""
    import os

    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
