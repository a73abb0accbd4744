"""Device-mesh utilities: the TPU-native replacement for pmap plumbing.

Training runs as ONE jitted SPMD program shard_mapped over a 1-D device mesh
(axis 'i' = the env/data axis).  Env state shards along the env batch axis;
params/optimizer state are replicated; gradients and running statistics sync
with `lax.pmean`/`lax.psum` over the mesh axis, which XLA lowers onto ICI (and
DCN across hosts).  This subsumes the reference's pmap idioms
(/root/reference/brax/training/pmap.py and the pmap in ppo/train.py:233).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as onp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "i"


def shard_map(f, mesh, in_specs, out_specs):
    """Version-portable shard_map with per-shard replication checks off."""
    if hasattr(jax, "shard_map"):
        return jax.shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
        )
    from jax.experimental.shard_map import shard_map as _sm

    return _sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False)


def create_mesh(devices: Optional[Sequence[jax.Device]] = None,
                axis_name: str = AXIS) -> Mesh:
    """1-D mesh over all (or given) devices, env/data axis only."""
    if devices is None:
        devices = jax.devices()
    return Mesh(onp.asarray(devices), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def env_sharded(mesh: Mesh, axis_name: str = AXIS) -> NamedSharding:
    """Shards the leading (env batch) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def put_replicated(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))


def put_env_sharded(tree, mesh: Mesh, axis_name: str = AXIS):
    return jax.device_put(tree, env_sharded(mesh, axis_name))


def synchronize_hosts():
    """Barrier across processes (parity: pmap.py:30-36).

    Uses the GSPMD-era barrier (an all-device psum under jit via
    multihost_utils) rather than the reference's pmap idiom.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("brax_tpu_synchronize_hosts")


def _fingerprint(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return sum(jnp.sum(jnp.asarray(l, jnp.float32) ** 2) for l in leaves)


def is_replicated(tree, mesh: Mesh) -> bool:
    """True if the tree holds identical values on all mesh devices.

    Parity: pmap.py:44-58 (pmin==pmax fingerprint check).
    """
    def per_shard(t):
        fp = _fingerprint(t)
        lo = jax.lax.pmin(fp, AXIS)
        hi = jax.lax.pmax(fp, AXIS)
        return (lo == hi).astype(jnp.int32)

    # broadcast the replicated tree into per-shard views
    f = shard_map(per_shard, mesh, in_specs=(P(),), out_specs=P())
    return bool(jax.jit(f)(tree))


def assert_is_replicated(tree, mesh: Mesh, debug=None):
    assert is_replicated(tree, mesh), debug
