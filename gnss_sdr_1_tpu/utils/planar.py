"""Planar complex representation at jit boundaries.

The TPU terminal backend (axon PJRT) does not implement complex64
host<->device transfers; complex math inside compiled programs is fine.
Convention: every jit boundary carries complex data as float32 arrays with a
trailing [..., 2] = (real, imag) axis — formed/split with these helpers.
Cost is one fused stack/slice per boundary, which XLA folds away.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def to_planar(x: np.ndarray) -> np.ndarray:
    """Host: complex array -> float32 [..., 2]."""
    x = np.asarray(x)
    out = np.empty(x.shape + (2,), dtype=np.float32)
    out[..., 0] = x.real
    out[..., 1] = x.imag
    return out


def from_planar_np(p: np.ndarray) -> np.ndarray:
    """Host: float32 [..., 2] -> complex64."""
    out = np.empty(p.shape[:-1], dtype=np.complex64)
    out.real = p[..., 0]
    out.imag = p[..., 1]
    return out


def pack_complex(c: jax.Array) -> jax.Array:
    """In-jit: complex [...] -> float32 [..., 2] (for outputs/carries)."""
    return jnp.stack([c.real, c.imag], axis=-1)


def unpack_complex(p: jax.Array) -> jax.Array:
    """In-jit: float32 [..., 2] -> complex (for inputs/carries)."""
    return jax.lax.complex(p[..., 0], p[..., 1])
