"""Dense batched joint constraints.

Joints of the same kind are compiled into one `JointGroup` with a leading
joint axis, so constraint resolution is a single fused VPU program per kind
followed by one scatter-add onto the body axis.  (The reference instead builds
per-kind Python classes and vmaps scalar math: brax/physics/joints.py and
spring_joints.py; this module reproduces their update rules densely.)

PBD joints (dynamics_mode='pbd'): position-level updates
  - revolute: joints.py:261-319
  - spherical (incl. sphericalized 1/2-dof): joints.py:322-415
Spring joints (dynamics_mode='legacy_spring'): acceleration-level updates
  - revolute/universal/spherical: spring_joints.py:115-303
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu import maths
from brax_tpu.maths import dot1, vdot
from brax_tpu.sim.types import DP, DQ, QP, Array, HArray


@struct.dataclass
class JointGroup:
    """A batch of same-kind joints, fully dense.

    Leaves have a leading (nj,) joint axis.  Static topology (body indices)
    is numpy so XLA sees constant gather/scatter indices.
    """

    kind: str = struct.field(pytree_node=False)  # 'revolute'|'spherical'|'spring_revolute'|'spring_universal'|'spring_spherical'
    dof: int = struct.field(pytree_node=False)
    parent: HArray = struct.field(pytree_node=False)  # (nj,) body indices
    child: HArray = struct.field(pytree_node=False)
    free_dofs: Optional[Tuple[int, ...]] = struct.field(pytree_node=False)

    off_p: Array = None  # (nj, 3)
    off_c: Array = None
    limit: Array = None  # (nj, dof, 2) radians
    axis_c: Array = None  # (nj, 3, 3)
    axis_p: Array = None  # (nj, 3, 3)
    angular_damping: Array = None  # (nj,)
    scale_pos: Array = None  # (nj,)
    scale_ang: Array = None
    # body params baked at build (reference bakes them too, joints.py:61-62)
    mass_p: Array = None  # (nj,)
    mass_c: Array = None
    inertia_p: Array = None  # (nj, 3) inverse inertia diagonal
    inertia_c: Array = None
    # spring-mode params
    stiffness: Array = None
    spring_damping: Array = None
    limit_strength: Array = None

    @property
    def n(self) -> int:
        return len(self.parent)


def _scatter_add3(vals_p: Array, vals_c: Array, parent: HArray, child: HArray, nb: int) -> Array:
    """Scatter-adds per-joint parent/child contributions onto bodies."""
    from brax_tpu.sim import lowering

    width = vals_p.shape[-1]
    out = jnp.zeros((nb, width), dtype=vals_p.dtype)
    out = lowering.scatter_add_rows(out, parent.a, vals_p)
    out = lowering.scatter_add_rows(out, child.a, vals_c)
    return out


def _position_update(g: JointGroup, qp_p: QP, qp_c: QP, pos_p: Array, pos_c: Array):
    """Positional PBD update pulling two anchor points together.

    Parity: brax/physics/joints.py:154-195.
    """
    dx = pos_p - pos_c
    arm_p = pos_p - qp_p.pos
    arm_c = pos_c - qp_c.pos

    c = maths.safe_norm(dx)[..., None]
    n = dx / (c + 1e-6)

    cr1 = jnp.cross(arm_p, n)
    w1 = (1.0 / g.mass_p)[..., None] + dot1(cr1, g.inertia_p * cr1)
    cr2 = jnp.cross(arm_c, n)
    w2 = (1.0 / g.mass_c)[..., None] + dot1(cr2, g.inertia_c * cr2)

    dlambda = -c / (w1 + w2 + 1e-6)
    p = dlambda * n

    sp = g.scale_pos[..., None]
    dq_p_pos = sp * (p / g.mass_p[..., None])
    dq_p_rot = sp * (0.5 * maths.vec_quat_mul(g.inertia_p * jnp.cross(arm_p, p), qp_p.rot))
    dq_c_pos = sp * (-p / g.mass_c[..., None])
    dq_c_rot = sp * (-0.5 * maths.vec_quat_mul(g.inertia_c * jnp.cross(arm_c, p), qp_c.rot))
    return (dq_p_pos, dq_p_rot), (dq_c_pos, dq_c_rot)


def _angle_update(g: JointGroup, qp_p: QP, qp_c: QP, dq: Array):
    """Angular PBD update for constraint violation vector dq (nj, 3).

    Parity: brax/physics/joints.py:130-152.
    """
    th = maths.safe_norm(dq)[..., None]
    n = dq / (th + 1e-6)

    w1 = dot1(n, g.inertia_p * n)
    w2 = dot1(n, g.inertia_c * n)
    dlambda = -th / (w1 + w2 + 1e-6)
    p = -dlambda * n

    sa = g.scale_ang[..., None]
    dq_p_rot = sa * (0.5 * maths.vec_quat_mul(g.inertia_p * p, qp_p.rot))
    dq_c_rot = sa * (-0.5 * maths.vec_quat_mul(g.inertia_c * p, qp_c.rot))
    return dq_p_rot, dq_c_rot


def _rotate_frame(axes: Array, rot: Array) -> Array:
    """Rotates each row of (nj, 3, 3) axes by per-joint quaternions (nj, 4)."""
    return maths.rotate(axes, rot[..., None, :])


def axis_angle(g: JointGroup, qp_p: QP, qp_c: QP):
    """Joint axes and angles; returns (nj, dof, 3), (nj, dof).

    Parity: revolute joints.py:311-319; spherical joints.py:388-415 (also the
    spring variants, which share the construction).
    """
    axis_p_r = _rotate_frame(g.axis_p, qp_p.rot)
    axis_c_r = _rotate_frame(g.axis_c, qp_c.rot)
    if g.kind in ("revolute", "spring_revolute"):
        axis_1_p = axis_p_r[..., 0, :]
        ref_p = axis_p_r[..., 2, :]
        ref_c = axis_c_r[..., 2, :]
        psi = maths.signed_angle(axis_1_p, ref_p, ref_c)
        return axis_1_p[..., None, :], psi[..., None]

    axis_1_p = axis_p_r[..., 0, :]
    axis_2_p = axis_p_r[..., 1, :]
    axis_1_c = axis_c_r[..., 0, :]
    axis_2_c = axis_c_r[..., 1, :]
    axis_3_c = axis_c_r[..., 2, :]

    line_of_nodes = jnp.cross(axis_3_c, axis_1_p)
    line_of_nodes = line_of_nodes / (1e-10 + maths.safe_norm(line_of_nodes)[..., None])
    psi = maths.signed_angle(axis_1_p, axis_2_p, line_of_nodes)
    axis_1_p_in_xz_c = dot1(axis_1_p, axis_1_c) * axis_1_c + dot1(axis_1_p, axis_2_c) * axis_2_c
    axis_1_p_in_xz_c = axis_1_p_in_xz_c / (1e-10 + maths.safe_norm(axis_1_p_in_xz_c)[..., None])
    ang_between = vdot(axis_1_p_in_xz_c, axis_1_p)
    theta = maths.safe_arccos(jnp.clip(ang_between, -1, 1)) * jnp.sign(vdot(axis_1_p, axis_3_c))
    yc_n_normal = -axis_3_c
    phi = maths.signed_angle(yc_n_normal, axis_2_c, line_of_nodes)

    if g.kind == "spring_universal":
        axes = jnp.stack([axis_1_p, axis_2_c], axis=-2)
        angles = jnp.stack([psi, theta], axis=-1)
    else:
        axes = jnp.stack([axis_1_p, axis_2_c, axis_3_c], axis=-2)
        angles = jnp.stack([psi, theta, phi], axis=-1)
    return axes, angles


def angle_vel(g: JointGroup, qp: QP):
    """Flat joint angles and velocities for observation vectors.

    Parity: brax/physics/joints.py:197-226.
    """
    qp_p = qp.take(g.parent)
    qp_c = qp.take(g.child)
    axes, angles = axis_angle(g, qp_p, qp_c)
    rel_ang = (qp_p.ang - qp_c.ang)[..., None, :]
    vels = vdot(rel_ang, axes)  # (nj, dof)
    angles_flat = angles.reshape(angles.shape[:-2] + (-1,))
    vels_flat = vels.reshape(vels.shape[:-2] + (-1,))
    if g.free_dofs is not None:
        idx = []
        for i, fd in enumerate(g.free_dofs):
            idx.extend(range(i * g.dof, i * g.dof + fd))
        angles_flat = jnp.take(angles_flat, jnp.array(idx), axis=-1)
        vels_flat = jnp.take(vels_flat, jnp.array(idx), axis=-1)
    return angles_flat, vels_flat


def damp(g: JointGroup, qp: QP, nb: int) -> DP:
    """Angular damping between connected bodies (joints.py:103-128)."""
    qp_p = qp.take(g.parent)
    qp_c = qp.take(g.child)
    torque = -1.0 * g.angular_damping[..., None] * (qp_p.ang - qp_c.ang)
    dang_p = g.inertia_p * torque
    dang_c = -g.inertia_c * torque
    dang = _scatter_add3(dang_p, dang_c, g.parent, g.child, nb)
    return DP(vel=jnp.zeros_like(dang), ang=dang)


def pbd_apply(g: JointGroup, qp: QP, nb: int) -> DQ:
    """Position-based constraint update, scattered onto bodies.

    Parity: Joint.apply (joints.py:79-100) with Revolute/Spherical
    apply_reduced.
    """
    qp_p = qp.take(g.parent)
    qp_c = qp.take(g.child)

    pos_p, _ = qp_p.to_world(g.off_p)
    pos_c, _ = qp_c.to_world(g.off_c)
    (dq_p_pos, dq_p_rot), (dq_c_pos, dq_c_rot) = _position_update(g, qp_p, qp_c, pos_p, pos_c)

    if g.kind == "revolute":
        axis_p_r = _rotate_frame(g.axis_p, qp_p.rot)
        axis_c_r = _rotate_frame(g.axis_c, qp_c.rot)
        axis = axis_p_r[..., 0, :]
        ref_p = axis_p_r[..., 2, :]
        ref_c = axis_c_r[..., 2, :]

        psi = maths.signed_angle(axis, ref_p, ref_c)
        axis_c_x = axis_c_r[..., 0, :]
        dq_1 = jnp.cross(axis, axis_c_x)

        ph = jnp.clip(psi, g.limit[..., 0, 0], g.limit[..., 0, 1])
        fixrot = maths.quat_rot_axis(axis, ph)
        n1 = maths.rotate(ref_p, fixrot)
        dq_2 = jnp.cross(n1, ref_c)

        # sum angle-update rows first, then add to the positional update
        # (matches reference addition order, joints.py:298-307)
        ap1, ac1 = _angle_update(g, qp_p, qp_c, dq_1)
        ap2, ac2 = _angle_update(g, qp_p, qp_c, dq_2)
        dq_p_rot = dq_p_rot + (ap1 + ap2)
        dq_c_rot = dq_c_rot + (ac1 + ac2)
    elif g.kind == "spherical":
        axis_p_r = _rotate_frame(g.axis_p, qp_p.rot)
        axis_c_r = _rotate_frame(g.axis_c, qp_c.rot)
        axis_1_p = axis_p_r[..., 0, :]
        axis_2_p = axis_p_r[..., 1, :]
        axis_1_c = axis_c_r[..., 0, :]
        axis_2_c = axis_c_r[..., 1, :]
        axis_3_c = axis_c_r[..., 2, :]

        line_of_nodes = jnp.cross(axis_3_c, axis_1_p)
        line_of_nodes = line_of_nodes / (1e-6 + maths.safe_norm(line_of_nodes)[..., None])
        axis_1_p_in_xz_c = dot1(axis_1_p, axis_1_c) * axis_1_c + dot1(axis_1_p, axis_2_c) * axis_2_c
        axis_1_p_in_xz_c = axis_1_p_in_xz_c / (1e-6 + maths.safe_norm(axis_1_p_in_xz_c)[..., None])
        axis_2_normal = jnp.cross(axis_1_p_in_xz_c, axis_1_p)
        axis_2_normal = axis_2_normal / (1e-6 + maths.safe_norm(axis_2_normal)[..., None])

        rows = (
            (axis_1_p, axis_2_p, line_of_nodes, 0),
            (-axis_2_normal * jnp.sign(vdot(axis_1_p, axis_3_c))[..., None], axis_1_p, axis_1_p_in_xz_c, 1),
            (axis_3_c, line_of_nodes, axis_2_c, 2),  # -yc_n_normal == axis_3_c
        )
        updates = []
        for n, n_1, n_2, lim_i in rows:
            ph = maths.signed_angle(n, n_1, n_2)
            lo = g.limit[..., lim_i, 0]
            hi = g.limit[..., lim_i, 1]
            mask = jnp.where(ph < lo, 1.0, 0.0)
            mask = jnp.where(ph > hi, 1.0, mask)
            ph = jnp.clip(ph, lo, hi)
            fixrot = maths.quat_rot_axis(n, ph)
            n1 = maths.rotate(n_1, fixrot)
            dq_ang = jnp.cross(n1, n_2) * mask[..., None]
            updates.append(_angle_update(g, qp_p, qp_c, dq_ang))
        # sum rows first, then add to positional update (ref joints.py:383-384)
        (ap1, ac1), (ap2, ac2), (ap3, ac3) = updates
        dq_p_rot = dq_p_rot + (ap1 + ap2 + ap3)
        dq_c_rot = dq_c_rot + (ac1 + ac2 + ac3)
    else:
        raise ValueError(f"pbd_apply on non-pbd joint group: {g.kind}")

    pos = _scatter_add3(dq_p_pos, dq_c_pos, g.parent, g.child, nb)
    rot = _scatter_add3(dq_p_rot, dq_c_rot, g.parent, g.child, nb)
    return DQ(pos=pos, rot=rot)


def spring_apply(g: JointGroup, qp: QP, nb: int) -> DP:
    """Acceleration-level spring joint update (spring_joints.py:89-303)."""
    qp_p = qp.take(g.parent)
    qp_c = qp.take(g.child)

    pos_p, vel_p = qp_p.to_world(g.off_p)
    pos_c, vel_c = qp_c.to_world(g.off_c)

    # push anchor points together
    impulse = (pos_p - pos_c) * g.stiffness[..., None] + g.spring_damping[..., None] * (vel_p - vel_c)
    dvel_p = -impulse / g.mass_p[..., None]
    dang_p = g.inertia_p * jnp.cross(pos_p - qp_p.pos, -impulse)
    dvel_c = impulse / g.mass_c[..., None]
    dang_c = g.inertia_c * jnp.cross(pos_c - qp_c.pos, impulse)

    axes, angles = axis_angle(g, qp_p, qp_c)

    if g.kind == "spring_revolute":
        axis = axes[..., 0, :]
        angle = angles[..., 0]
        axis_c_x = maths.rotate(g.axis_c[..., 0, :], qp_c.rot)
        torque = g.stiffness[..., None] * jnp.cross(axis, axis_c_x)
        lo, hi = g.limit[..., 0, 0], g.limit[..., 0, 1]
        dang = jnp.where(angle < lo, lo - angle, 0)
        dang = jnp.where(angle > hi, hi - angle, dang)
        torque -= g.limit_strength[..., None] * axis * dang[..., None]
    elif g.kind == "spring_universal":
        axis_1, axis_2 = axes[..., 0, :], axes[..., 1, :]
        axis_c_proj = axis_2 - dot1(axis_2, axis_1) * axis_1
        axis_c_proj = axis_c_proj / maths.safe_norm(axis_c_proj)[..., None]
        torque = (g.limit_strength[..., None] / 5.0) * jnp.cross(axis_c_proj, axis_2)
        dang = jnp.where(angles < g.limit[..., 0], g.limit[..., 0] - angles, 0)
        dang = jnp.where(angles > g.limit[..., 1], g.limit[..., 1] - angles, dang)
        torque -= g.limit_strength[..., None] * jnp.sum(axes * dang[..., None], axis=-2)
    elif g.kind == "spring_spherical":
        dang = jnp.where(angles < g.limit[..., 0], g.limit[..., 0] - angles, 0)
        dang = jnp.where(angles > g.limit[..., 1], g.limit[..., 1] - angles, dang)
        torque = -g.limit_strength[..., None] * jnp.sum(axes * dang[..., None], axis=-2)
    else:
        raise ValueError(f"spring_apply on non-spring joint group: {g.kind}")

    torque = torque - g.angular_damping[..., None] * (qp_p.ang - qp_c.ang)
    dang_p = dang_p + g.inertia_p * torque
    dang_c = dang_c - g.inertia_c * torque

    vel = _scatter_add3(dvel_p, dvel_c, g.parent, g.child, nb)
    ang = _scatter_add3(dang_p, dang_c, g.parent, g.child, nb)
    return DP(vel=vel, ang=ang)
