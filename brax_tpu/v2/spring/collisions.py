"""Impulse-based collision resolution with Baumgarte stabilization.

Parity with reference brax/v2/spring/collisions.py: a normal impulse with
restitution plus a friction drag impulse capped by the Coulomb cone, applied
only to penetrating, approaching contacts.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.tree_util import tree_map

from brax_tpu import maths
from brax_tpu.v2.base import Contact, Motion, System, Transform

Array = jax.Array


def resolve(
    sys: System,
    xi: Transform,
    xdi: Motion,
    inv_inertia: Array,
    contact: Optional[Contact],
) -> Tuple[Motion, Array, Array]:
    """Returns (impulses, world positions, link indices) for all contacts."""
    if contact is None:
        return Motion.zero((1,)), jnp.array([]), jnp.array([])

    @jax.vmap
    def impulse(contact):
        link_idx = jnp.array(contact.link_idx)
        rel_pos = contact.pos - xi.take(link_idx).pos
        xd = xdi.take(link_idx)
        rel_vel = xd.vel + jnp.cross(xd.ang, rel_pos)
        rel_vel = rel_vel * (link_idx > -1).reshape(-1, 1)
        contact_vel = rel_vel[0] - rel_vel[1]
        normal_vel = jnp.dot(contact.normal, contact_vel)

        mass = sys.link.inertia.mass.take(link_idx)
        i_inv = inv_inertia.take(link_idx, axis=0)
        i_inv = i_inv * (link_idx > -1).reshape(-1, 1, 1)

        temp1 = i_inv[0] @ jnp.cross(rel_pos[0], contact.normal)
        temp2 = i_inv[1] @ jnp.cross(rel_pos[1], contact.normal)
        ang = jnp.dot(
            contact.normal,
            jnp.cross(temp1, rel_pos[0]) + jnp.cross(temp2, rel_pos[1]),
        )
        invmass = (1 / mass) * (link_idx > -1)
        denom = invmass[0] + invmass[1] + ang
        baumgarte_vel = sys.baumgarte_erp / sys.dt * contact.penetration
        imp = (
            -1.0 * (1.0 + contact.elasticity) * normal_vel + baumgarte_vel
        ) / denom
        impulse_vec = imp * contact.normal

        # friction drag along the surface
        vel_d = contact_vel - normal_vel * contact.normal
        dir_d = vel_d / (1e-6 + maths.safe_norm(vel_d))
        temp1 = i_inv[0] @ jnp.cross(rel_pos[0], dir_d)
        temp2 = i_inv[1] @ jnp.cross(rel_pos[1], dir_d)
        ang_d = jnp.dot(
            dir_d, jnp.cross(temp1, rel_pos[0]) + jnp.cross(temp2, rel_pos[1])
        )
        impulse_d = maths.safe_norm(vel_d) / (invmass[0] + invmass[1] + ang_d)
        impulse_d = jnp.minimum(impulse_d, contact.friction * imp)
        impulse_d_vec = -1.0 * impulse_d * dir_d

        apply_n = (contact.penetration >= 0.0) & (normal_vel < 0) & (imp > 0.0)
        apply_d = apply_n * (maths.safe_norm(vel_d) > 1e-3)
        return impulse_vec * apply_n + impulse_d_vec * apply_d, contact.pos

    p, pos = impulse(contact)

    link_idx = jnp.concatenate([jnp.asarray(i) for i in contact.link_idx])
    p = tree_map(lambda *t: jnp.concatenate(t), p, -p)
    p = p * (link_idx.reshape((-1, 1)) != -1)
    p = Motion.create(vel=p)
    pos = jnp.tile(pos, (2, 1))
    return p, pos, link_idx
