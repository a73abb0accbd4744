"""Maximal-coordinate integration for the spring pipeline.

Parity with reference brax/v2/spring/integrator.py: forces integrate at
acceleration level with exponential velocity damping; collision impulses
apply at velocity level (averaged per link); positions advance kinetically.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2.base import Motion, System, Transform
from brax_tpu.v2.spring import maximal

Array = jax.Array


def _kinetic(sys: System, x: Transform, xd: Motion) -> Transform:
    """Advances positions/rotations one dt with current velocities."""
    pos = x.pos + xd.vel * sys.dt
    rot_at_ang_quat = maths.ang_to_quat(xd.ang) * 0.5 * sys.dt
    rot = x.rot + maths.quat_mul(rot_at_ang_quat, x.rot)
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return Transform(pos=pos, rot=rot)


def _acc_update(sys: System, xd: Motion, dxdd: Motion) -> Motion:
    """Damped semi-implicit velocity update from accelerations."""
    vel = jnp.exp(sys.vel_damping * sys.dt) * xd.vel + (dxdd.vel + sys.gravity) * sys.dt
    ang = jnp.exp(sys.ang_damping * sys.dt) * xd.ang + dxdd.ang * sys.dt
    return Motion(vel=vel, ang=ang)


def forward(
    sys: System,
    xi: Transform,
    xdi: Motion,
    inv_inertia: Array,
    f: Motion,
    pos: Array,
    link_idx: Array,
) -> Motion:
    """Integrates applied world forces into CoM-frame velocities."""
    xi_all = xi.take(link_idx)
    mass = sys.link.inertia.mass.take(link_idx)
    inv_i = inv_inertia.take(link_idx, axis=0)
    xddi_all = maximal.world_impulse(
        xi_all.pos, mass, inv_i, f.vel, pos, torque=f.ang
    )
    dxddi = jax.tree_util.tree_map(
        lambda v: jax.ops.segment_sum(v, link_idx, xi.pos.shape[0]), xddi_all
    )
    return _acc_update(sys, xdi, dxddi)


def forward_c(
    sys: System,
    xi: Transform,
    xdi: Motion,
    inv_inertia: Array,
    p: Motion,
    pos: Array,
    link_idx: Array,
) -> Tuple[Transform, Motion]:
    """Applies velocity-level impulses (averaged per link), then advances."""
    if link_idx.shape[0] != 0:
        xi_all = xi.take(link_idx)
        mass = sys.link.inertia.mass.take(link_idx)
        inv_i = inv_inertia.take(link_idx, axis=0)
        xdi_all = maximal.world_impulse(
            xi_all.pos, mass, inv_i, p.vel, pos, torque=None
        )
        apply_v = jnp.where(jnp.any(p.vel, axis=-1) & (link_idx != -1), 1.0, 0.0)
        n_v = jax.ops.segment_sum(apply_v, link_idx, sys.num_links())
        n_v = jnp.reshape(1e-8 + n_v, (sys.num_links(), 1))
        dxdi = jax.tree_util.tree_map(
            lambda v: jax.ops.segment_sum(v, link_idx, xi.pos.shape[0]) / n_v,
            xdi_all,
        )
        xdi = xdi + dxdi

    xi = _kinetic(sys, xi, xdi)
    return xi, xdi
