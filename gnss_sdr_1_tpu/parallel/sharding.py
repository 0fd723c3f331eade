"""Mesh construction and sharding helpers.

Channel sharding is the embarrassingly-parallel axis (each satellite channel
is independent until observables fan-in on host), so it is the primary
scaling axis (>= 80% efficiency target, BASELINE.md).  Time sharding splits
one long IQ stream into overlapping blocks across devices; the overlap-save
halo is exchanged with a neighbor ppermute so block convolutions
(conditioning FIR / acquisition correlation) are exact at the seams.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def channel_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the 'channel' axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("channel",))


def time_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the 'time' axis (sequence-parallel sample blocks)."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), ("time",))


def shard_channel_tree(tree, mesh: Mesh):
    """Shard every array leaf along its leading (channel) axis; scalars and
    leaves not divisible by the mesh stay replicated."""
    n = mesh.shape["channel"]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P("channel", *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)


def replicate(x, mesh: Mesh):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))


def halo_exchange_blocks(blocks: jax.Array, halo: int, axis_name: str = "time"):
    """Inside shard_map over the 'time' axis: append the first `halo` samples
    of the NEXT device's block to this device's block (overlap-save tail),
    so per-device convolution/correlation windows are exact at seams.

    blocks: per-device [block_len] (inside shard_map).  Returns
    [block_len + halo]; the last device wraps (callers zero it or ignore the
    final tail).
    """
    n = jax.lax.psum(1, axis_name)
    head = jax.lax.dynamic_slice_in_dim(blocks, 0, halo, axis=0)
    # send my head to the LEFT neighbor: device i receives head of i+1
    perm = [(i, (i - 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(head, axis_name, perm)
    return jnp.concatenate([blocks, recv], axis=0)
