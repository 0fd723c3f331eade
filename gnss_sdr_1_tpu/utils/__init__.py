"""Shared utilities."""

from .planar import to_planar, from_planar_np, pack_complex, unpack_complex

__all__ = ["to_planar", "from_planar_np", "pack_complex", "unpack_complex"]
