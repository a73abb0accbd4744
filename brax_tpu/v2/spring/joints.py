"""Spring/damper joint constraint forces in joint frame.

Parity with reference brax/v2/spring/joints.py: each joint type produces a
restorative spatial force pulling the child link onto its joint anchor and
within its angle limits, applied as equal-and-opposite world forces.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import kinematics, scan
from brax_tpu.v2.base import QD_WIDTHS, DoF, Link, Motion, System, Transform

Array = jax.Array


def _free(*_) -> Motion:
    return Motion(vel=jnp.zeros(3), ang=jnp.zeros(3))


def _one_dof(link: Link, x: Transform, xd: Motion, dof: DoF) -> Motion:
    """Revolute (or prismatic) spring constraint force in joint frame."""
    joint_motion, _ = kinematics.link_to_joint_motion(dof.motion)

    # anchor the link to zero joint offset; a prismatic axis stays free
    vel = -x.pos * link.constraint_stiffness
    is_prismatic = (dof.motion.vel > 0).any()
    vel = vel - jnp.dot(joint_motion.vel[0], vel) * joint_motion.vel[0] * is_prismatic
    damp = -xd.vel * link.constraint_damping
    vel += damp - jnp.dot(joint_motion.vel[0], damp) * joint_motion.vel[0] * is_prismatic

    axis_c_x = maths.rotate(joint_motion.ang[0], x.rot)
    axis_c_y = maths.rotate(joint_motion.ang[1], x.rot)
    _, _, (psi, _, _), _ = kinematics.axis_angle_ang(x, xd, dof.motion)

    # align rotation to the joint axis
    ang = -1 * link.constraint_stiffness * jnp.cross(joint_motion.ang[0], axis_c_x)
    ang -= (
        link.constraint_stiffness
        * jnp.cross(joint_motion.ang[1], axis_c_y)
        * is_prismatic
    )
    ang -= link.constraint_ang_damping * xd.ang

    if dof.limit is not None:
        limit_min, limit_max = dof.limit
        dang = jnp.where(psi < limit_min, psi - limit_min, 0)
        dang = jnp.where(psi > limit_max, psi - limit_max, dang)
        ang -= (
            link.constraint_limit_stiffness
            * joint_motion.ang[0]
            * dang
            * (1 - is_prismatic)
        )
        xp = jnp.dot(x.pos, joint_motion.vel[0])
        dvel = jnp.where(xp < limit_min, xp - limit_min, 0)
        dvel = jnp.where(xp > limit_max, xp - limit_max, dvel)
        vel -= (
            link.constraint_limit_stiffness
            * joint_motion.vel[0]
            * dvel
            * is_prismatic
        )

    return Motion(ang=ang, vel=vel)


def _universal(link: Link, x: Transform, xd: Motion, dof: DoF) -> Motion:
    """2-dof spring constraint force in joint frame."""
    vel = -x.pos * link.constraint_stiffness
    vel += -xd.vel * link.constraint_damping

    _, (axis_1, axis_2, _), angles, _ = kinematics.axis_angle_ang(x, xd, dof.motion)
    axis_c_proj = axis_2 - jnp.dot(axis_2, axis_1) * axis_1
    axis_c_proj = axis_c_proj / maths.safe_norm(axis_c_proj)
    ang = -1.0 * link.constraint_limit_stiffness * jnp.cross(axis_c_proj, axis_2)

    if dof.limit is not None:
        limit_min, limit_max = dof.limit
        axis = jnp.stack((axis_1, axis_2))
        angle = jnp.stack(angles)[:2]
        dang = jnp.where(angle < limit_min, angle - limit_min, 0)
        dang = jnp.where(angle > limit_max, angle - limit_max, dang)
        ang -= link.constraint_limit_stiffness * jnp.sum(
            axis * dang[:, None], axis=0
        )

    ang -= link.constraint_ang_damping * xd.ang
    return Motion(ang=ang, vel=vel)


def _spherical(link: Link, x: Transform, xd: Motion, dof: DoF) -> Motion:
    """3-dof spring constraint force in joint frame."""
    vel = -x.pos * link.constraint_stiffness
    vel += -xd.vel * link.constraint_damping
    ang = -1.0 * link.constraint_ang_damping * xd.ang

    if dof.limit is not None:
        limit_min, limit_max = dof.limit
        _, axes, angles, _ = kinematics.axis_angle_ang(x, xd, dof.motion)
        axis = jnp.stack(axes)
        angle = jnp.stack(angles)
        dang = jnp.where(angle < limit_min, angle - limit_min, 0)
        dang = jnp.where(angle > limit_max, angle - limit_max, dang)
        ang -= link.constraint_limit_stiffness * jnp.sum(
            axis * dang[:, None], axis=0
        )

    return Motion(ang=ang, vel=vel)


def resolve(
    sys: System, x: Transform, xd: Motion
) -> Tuple[Motion, Array, Array]:
    """World-frame joint spring forces, application points, link indices."""

    def j_fn(typ, link, x_j, xd_j, dof):
        dof = jax.tree_util.tree_map(
            lambda x: x.reshape((x_j.pos.shape[0], -1)), dof
        )
        dof = dof.replace(
            motion=jax.tree_util.tree_map(
                lambda x: x.reshape((-1, QD_WIDTHS[typ], 3)), dof.motion
            )
        )
        j_fn_map = {"f": _free, "1": _one_dof, "2": _universal, "3": _spherical}
        return jax.vmap(j_fn_map[typ])(link, x_j, xd_j, dof)

    p_idx = jnp.array(sys.link_parents)
    c_idx = jnp.arange(sys.num_links())

    x_pad = x.concatenate(Transform.zero((1,)))
    x_p = x_pad.take(p_idx)
    x_c = x.do(sys.link.joint)
    x_joint = x_p.do(sys.link.transform).do(sys.link.joint)

    j, jd = kinematics.world_to_joint_frame(sys, x, xd)
    f_j = scan.link_types(sys, j_fn, "llld", "l", sys.link, j, jd, sys.dof)
    f_w = jax.tree_util.tree_map(lambda v: maths.rotate(v, x_joint.rot), f_j)

    f = jax.tree_util.tree_map(lambda v: jnp.vstack([v, -v]), f_w)
    pos = jnp.vstack((x_c.pos, x_joint.pos))
    link_idx = jnp.hstack((c_idx, p_idx))
    f = f * (link_idx.reshape((-1, 1)) != -1)
    return f, pos, link_idx
