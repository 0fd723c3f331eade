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


# ---------------- multi-host distribution (SURVEY §2.14) ----------------

def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for multi-host runs.

    Called once per host before any device use.  Arguments default from the
    standard environment (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID, or the TPU pod metadata JAX autodetects).  Returns True
    if a multi-process runtime was initialized, False for the common
    single-host case (no coordinator configured) — callers proceed with the
    local devices either way, so single-host code paths are unchanged.
    """
    import os

    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if coordinator is None and num_processes is None:
        return False
    kw = {}
    if coordinator is not None:
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = num_processes
    elif os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is not None:
        kw["process_id"] = process_id
    elif os.environ.get("JAX_PROCESS_ID"):
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)
    return True


def host_channel_mesh() -> Mesh:
    """('host', 'channel') mesh over ALL processes' devices: channels shard
    across hosts first (the independent axis rides DCN without collectives
    in the hot loop — observables fan-in is host-side), then across each
    host's local chips over ICI."""
    devs = np.asarray(jax.devices())
    n_proc = max(1, getattr(jax, "process_count", lambda: 1)())
    local = len(devs) // n_proc
    return Mesh(devs.reshape(n_proc, local), ("host", "channel"))


def shard_host_channel_tree(tree, mesh: Mesh):
    """Shard leading (channel) axes over BOTH mesh axes flattened —
    channels distribute over host x local-device."""
    total = mesh.shape["host"] * mesh.shape["channel"]

    def put(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] % total == 0:
            spec = P(("host", "channel"), *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
