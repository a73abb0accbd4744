"""Forward and inverse kinematics over the link tree.

Functional parity with reference brax/v2/kinematics.py, written batch-first:
joint transforms for a whole link-type group are built with broadcasting
quaternion ops instead of per-row vmaps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import scan
from brax_tpu.v2.base import QD_WIDTHS, Motion, System, Transform

Array = jax.Array


def _joint_transform_motion(typ: str, q: Array, qd: Array, motion: Motion):
    """Per-group joint transform/motion in joint frame (jcalc).

    Revolute dofs rotate about motion.ang; prismatic dofs translate along
    motion.vel.  Stacked (2/3-dof) joints accumulate one dof at a time.
    Parity: reference kinematics.py:43-76.
    """
    if typ == "f":
        q, qd = q.reshape((-1, 7)), qd.reshape((-1, 6))
        j = Transform(pos=q[:, 0:3], rot=q[:, 3:7])
        jd = Motion(ang=qd[:, 3:6], vel=qd[:, 0:3])
        return j, jd

    rot, _ = maths.normalize_with_norm(maths.quat_rot_axis(motion.ang, q))
    j = Transform(pos=motion.vel * q[:, None], rot=rot)
    jd = Motion(ang=motion.ang * qd[:, None], vel=motion.vel * qd[:, None])

    num_dofs = int(typ)
    s = (-1, num_dofs)
    j_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), j)
    jd_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), jd)

    j = jax.tree_util.tree_map(lambda x: x[:, 0], j_stack)
    jd = jax.tree_util.tree_map(lambda x: x[:, 0], jd_stack)
    for i in range(1, num_dofs):
        j_i = jax.tree_util.tree_map(lambda x: x[:, i], j_stack)
        jd_i = jax.tree_util.tree_map(lambda x: x[:, i], jd_stack)
        j = j.do(j_i)
        jd = jd + Motion(
            ang=maths.rotate(jd_i.ang, j_i.rot),
            vel=maths.rotate(jd_i.vel + jnp.cross(j_i.pos, jd_i.ang), j_i.rot),
        )
    return j, jd


@maths.physics_precision
def forward(sys: System, q: Array, qd: Array) -> Tuple[Transform, Motion]:
    """Joint position/velocity -> world-frame transform/motion.

    Parity: reference kinematics.py:27-103.
    """

    def jcalc(typ, q, qd, motion):
        return _joint_transform_motion(typ, q, qd, motion)

    j, jd = scan.link_types(sys, jcalc, "qdd", "ll", q, qd, sys.dof.motion)

    # joint position offset, then place in the parent link frame
    anchor = Transform.create(rot=j.rot).do(sys.link.joint)
    j = j.replace(pos=j.pos + sys.link.joint.pos - anchor.pos)
    j = sys.link.transform.do(j)

    def world(parent, j, jd):
        if parent is None:
            return j, jd
        x, xd = parent
        x = x.do(j)
        xd = xd + Motion(
            ang=maths.rotate(jd.ang, x.rot),
            vel=maths.rotate(jd.vel + jnp.cross(x.pos, jd.ang), x.rot),
        )
        return x, xd

    x, xd = scan.tree(sys, world, "ll", j, jd)
    x = x.replace(rot=maths.normalize_with_norm(x.rot)[0])
    return x, xd


def world_to_joint_frame(
    sys: System, x: Transform, xd: Motion
) -> Tuple[Transform, Motion]:
    """Moves maximal-coordinate state into each link's joint frame.

    Parity: reference kinematics.py:106-133.
    """
    x_pad = x.concatenate(Transform.zero((1,)))
    xd_pad = xd.concatenate(Motion.zero((1,)))

    p_idx = jnp.array(sys.link_parents)
    x_p = x_pad.take(p_idx)
    xd_p = xd_pad.take(p_idx)

    x_joint = x_p.do(sys.link.transform).do(sys.link.joint)
    x_c = x.do(sys.link.joint)
    j = x_c.to_local(x_joint)

    # world velocity of the joint anchor point on the parent
    xd_wj = Transform.create(pos=x_p.pos - x_joint.pos).do(xd_p)
    xd_joint = xd - xd_wj
    jd = jax.tree_util.tree_map(
        lambda v: maths.rotate(v, maths.quat_inv(x_joint.rot)), xd_joint
    )
    return j, jd


def link_to_joint_motion(motion: Motion) -> Tuple[Motion, Array]:
    """Completes a (dofs, 3) joint motion into a full 3-dof joint frame.

    Returns the completed frame and the joint's handedness (parity).  For 1/2
    dof joints the remaining axes come from rotating the identity frame so
    local-x (and local-y) align with the given axes.
    Parity: reference kinematics.py:136-199.
    """
    if motion.ang.shape[0] == 3:
        return Motion(
            ang=jnp.stack(
                [
                    motion.ang[0],
                    motion.ang[1],
                    jnp.cross(motion.ang[0], motion.ang[1]),
                ]
            ),
            vel=jnp.stack(
                [
                    motion.vel[0],
                    motion.vel[1],
                    jnp.cross(motion.vel[0], motion.vel[1]),
                ]
            ),
        ), jnp.dot(jnp.cross(motion.ang[0], motion.ang[1]), motion.ang[2])

    def j_axes(axis):
        frame = jnp.eye(3)
        rot = maths.from_to(frame[0], axis[0])
        y_temp = maths.rotate(frame[1], rot)
        second_axis = axis[1] if axis.shape[0] > 1 else y_temp
        second_angle = maths.signed_angle(axis[0], y_temp, second_axis)
        second_rot = maths.quat_rot_axis(axis[0], second_angle)
        return maths.quat_mul(second_rot, rot)

    rot_ang, rot_vel = j_axes(motion.ang), j_axes(motion.vel)
    frame_ang = maths.rotate(jnp.eye(3), rot_ang[None])
    frame_vel = maths.rotate(jnp.eye(3), rot_vel[None])
    return Motion(ang=frame_ang, vel=frame_vel), jnp.asarray(1.0)


def axis_angle_ang(
    j: Transform, jd: Motion, motion: Motion
) -> Tuple[Tuple[Array, ...], Tuple[Array, ...], Tuple[Array, ...], Tuple[Array, ...]]:
    """Axes, torque axes, angles, angular velocities of one joint.

    Line-of-nodes x-y'-z'' intrinsic Euler decomposition shared by the
    universal and spherical joints.  Parity: reference kinematics.py:202-244.
    """
    joint_motion, parity = link_to_joint_motion(motion)

    child_frame = maths.rotate(joint_motion.ang, j.rot[None])

    line_of_nodes = jnp.cross(child_frame[2], joint_motion.ang[0])
    line_of_nodes = line_of_nodes / (1e-10 + maths.safe_norm(line_of_nodes))
    y_n_normal = joint_motion.ang[0]
    psi = maths.signed_angle(y_n_normal, joint_motion.ang[1], line_of_nodes)
    axis_1_p_in_xz_c = (
        jnp.dot(joint_motion.ang[0], child_frame[0]) * child_frame[0]
        + jnp.dot(joint_motion.ang[0], child_frame[1]) * child_frame[1]
    )
    axis_1_p_in_xz_c = axis_1_p_in_xz_c / (1e-10 + maths.safe_norm(axis_1_p_in_xz_c))
    ang_between = jnp.dot(axis_1_p_in_xz_c, joint_motion.ang[0])
    theta = maths.safe_arccos(jnp.clip(ang_between, -1, 1)) * jnp.sign(
        jnp.dot(joint_motion.ang[0], child_frame[2])
    )
    yc_n_normal = -child_frame[2] * parity
    phi = maths.signed_angle(yc_n_normal, child_frame[1], line_of_nodes)

    axis = (child_frame[0], child_frame[1], child_frame[2] * parity)
    torque_axis = (joint_motion.ang[0], child_frame[1], child_frame[2] * parity)
    angle = (psi, theta, phi)
    vel = tuple(jnp.dot(a, jd.ang) for a in axis)
    return axis, torque_axis, angle, vel


def axis_slide_vel(
    x: Transform, xd: Motion, motion: Motion
) -> Tuple[Array, Array, Array]:
    """Prismatic axes, coordinates, velocities (reference kinematics.py:247-266)."""
    joint_motion, _ = link_to_joint_motion(motion)
    coords = joint_motion.vel @ x.pos
    velocities = joint_motion.vel @ xd.vel
    return joint_motion.vel, coords, velocities


@maths.physics_precision
def inverse(sys: System, x: Transform, xd: Motion) -> Tuple[Array, Array]:
    """Maximal coordinates -> reduced q/qd (reference kinematics.py:269-312)."""
    j, jd = world_to_joint_frame(sys, x, xd)

    def one_dof(j, jd, motion):
        _, _, (angle, _, _), (ang_vel, _, _) = axis_angle_ang(j, jd, motion)
        _, (slide_x, _, _), (vel, _, _) = axis_slide_vel(j, jd, motion)
        q = jnp.where(motion.ang.any(), angle, slide_x)
        qd = jnp.where(motion.ang.any(), ang_vel, vel)
        return q, qd

    def mixed_dof(j, jd, motion, n):
        """2/3-dof joints that may mix prismatic and revolute axes.

        Pure-rotational joints keep the Euler (line-of-nodes)
        decomposition; joints with slide rows (e.g. planar roots:
        slide-slide-hinge) select per dof — prismatic rows read
        coordinates from axis_slide_vel, and a lone revolute row extracts
        its angle directly from the joint quaternion about its own axis
        (exact when the joint has a single rotational dof, which is the
        only way slides and hinges mix in MJCF-shaped systems).  The
        reference leaves these joints on the angles-only path
        (kinematics.py:284-290) and mis-reads planar roots.
        """
        _, _, angles, ang_vels = axis_angle_ang(j, jd, motion)
        _, slides, slide_vels = axis_slide_vel(j, jd, motion)
        is_ang = motion.ang.any(axis=-1)[:n]
        pure_rot = is_ang.all()
        axis = motion.ang[:n]
        axis = axis / (1e-10 + maths.safe_norm(axis, axis=-1)[..., None])
        single = 2.0 * jnp.arctan2(axis @ j.rot[1:], j.rot[0])
        single_vel = axis @ jd.ang
        ang_q = jnp.where(pure_rot, jnp.array(angles[:n]), single)
        ang_qd = jnp.where(pure_rot, jnp.array(ang_vels[:n]), single_vel)
        q = jnp.where(is_ang, ang_q, slides[:n])
        qd = jnp.where(is_ang, ang_qd, slide_vels[:n])
        return q, qd

    def two_dof(j, jd, motion):
        return mixed_dof(j, jd, motion, 2)

    def three_dof(j, jd, motion):
        return mixed_dof(j, jd, motion, 3)

    def free(x, xd, _):
        return jnp.concatenate([x.pos, x.rot]), jnp.concatenate([xd.vel, xd.ang])

    def q_fn(typ, j, jd, motion):
        motion = jax.tree_util.tree_map(
            lambda y: y.reshape((-1, QD_WIDTHS[typ], 3)), motion
        )
        q_fn_map = {"f": free, "1": one_dof, "2": two_dof, "3": three_dof}
        q, qd = jax.vmap(q_fn_map[typ])(j, jd, motion)
        return jnp.array(q).reshape(-1), jnp.array(qd).reshape(-1)

    q, qd = scan.link_types(sys, q_fn, "lld", "qd", j, jd, sys.dof.motion)
    return q, qd
