"""Initial-state construction: default joint angles and default QP.

Places bodies by walking the kinematic tree in depth order, applying joint
rotations/offsets, then raises free-root trees above z=0.  Fully traceable
(pure jnp with static unrolled loops), so env `reset` can randomize joint
angles/velocities under jit.

Parity: /root/reference/brax/physics/system.py:86-242 (default_angle,
default_qp) and brax/physics/bodies.py:62-98 (min_z).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as onp

from brax_tpu import maths
from brax_tpu.sim import config as cfg
from brax_tpu.sim.builder import BuildArtifacts, _np_euler_to_quat
from brax_tpu.sim.types import QP, Array


def _joint_dof(j: cfg.Joint) -> int:
    """Number of live (nonzero-limit) dofs, ignoring sphericalization padding."""
    return sum(lo != 0 or hi != 0 for lo, hi in j.angle_limits)


def default_angle(art: BuildArtifacts, default_index: int = 0) -> Array:
    """Default joint angles (radians), parity system.py:86-110."""
    config = art.config
    if not config.joints:
        return jnp.array([])

    dofs = {j.name: _joint_dof(j) for j in config.joints}
    angles: Dict[str, Array] = {}

    if default_index < len(config.defaults):
        for ja in config.defaults[default_index].angles:
            angles[ja.name] = jnp.array(ja.angle[: dofs[ja.name]]) * jnp.pi / 180

    for joint in config.joints:
        if joint.name not in angles:
            dof = dofs[joint.name]
            angles[joint.name] = jnp.array(
                [(lo + hi) * onp.pi / 360 for lo, hi in joint.angle_limits][:dof]
            )

    return jnp.concatenate([angles[j.name] for j in config.joints])


def default_qp(
    art: BuildArtifacts,
    default_index: int = 0,
    joint_angle: Optional[Array] = None,
    joint_velocity: Optional[Array] = None,
) -> QP:
    """Default system state; traceable in joint_angle/joint_velocity.

    Parity: system.py:112-242.
    """
    config = art.config
    body_index = art.body_index
    nb = len(config.bodies)
    num_joint_dof = sum(_joint_dof(j) for j in config.joints)

    qp = QP.zero((nb,))

    default = None
    if default_index < len(config.defaults):
        default = config.defaults[default_index]
        for dqp in default.qps:
            i = body_index[dqp.name]
            qp = qp.replace(
                pos=qp.pos.at[i].set(jnp.array(dqp.pos)),
                rot=qp.rot.at[i].set(jnp.asarray(_np_euler_to_quat(dqp.rot), dtype=jnp.float32)),
                vel=qp.vel.at[i].set(jnp.array(dqp.vel)),
                ang=qp.ang.at[i].set(jnp.array(dqp.ang)),
            )

    if joint_angle is None:
        joint_angle = default_angle(art, default_index)
    if joint_velocity is None:
        joint_velocity = jnp.zeros_like(joint_angle)

    # order joints by depth of parent in the kinematic tree (system.py:137-150)
    joint_idxs = []
    beg = 0
    for j in config.joints:
        dof = _joint_dof(j)
        joint_idxs.append((j, (beg, beg + dof)))
        beg += dof
    lineage = {j.child: j.parent for j in config.joints}
    depth = {}
    for child, parent in lineage.items():
        depth[child] = 1
        while parent in lineage:
            parent = lineage[parent]
            depth[child] += 1
    joint_idxs = sorted(joint_idxs, key=lambda x: depth.get(x[0].parent, 0))
    joint = [j for j, _ in joint_idxs]

    if joint:
        # pad per-joint angles to 3 dof (system.py:153-169)
        takes = []
        for j, (beg, end) in joint_idxs:
            arr = list(range(beg, end))
            arr.extend([num_joint_dof] * (3 - len(arr)))
            takes.extend(arr)
        takes = jnp.array(takes, dtype=jnp.int32)

        def to_3dof(a):
            a = jnp.concatenate([a, jnp.array([0.0])])
            return jnp.take(a, takes).reshape(len(joint), 3)

        joint_angle3 = to_3dof(joint_angle)
        joint_velocity3 = to_3dof(joint_velocity)

        # per-joint local rotation + angular velocity (system.py:171-190)
        local_rots, local_angs = [], []
        for k, j in enumerate(joint):
            rot_q = jnp.asarray(_np_euler_to_quat(j.rotation), dtype=jnp.float32)
            ref_q = jnp.asarray(_np_euler_to_quat(j.reference_rotation), dtype=jnp.float32)
            axes = maths.rotate(jnp.eye(3), rot_q[None, :])
            ang = (axes.T @ joint_velocity3[k]).T
            rot = ref_q
            for a in range(3):
                # intrinsic euler rotations: each axis is rotated by prior rots
                axis = maths.rotate(axes[a], rot)
                next_rot = maths.quat_rot_axis(axis, joint_angle3[k, a])
                rot = maths.quat_mul(next_rot, rot)
            local_rots.append(rot)
            local_angs.append(ang)

        # place children in depth order (system.py:192-213)
        for k, j in enumerate(joint):
            body_p = body_index[j.parent]
            body_c = body_index[j.child]
            off_p = jnp.array(j.parent_offset)
            off_c = jnp.array(j.child_offset)
            local_rot = local_rots[k]
            world_rot = maths.quat_mul(qp.rot[body_p], local_rot)
            local_pos = off_p - maths.rotate(off_c, local_rot)
            world_pos = qp.pos[body_p] + maths.rotate(local_pos, qp.rot[body_p])
            world_ang = maths.rotate(local_angs[k], qp.rot[body_p])
            qp = qp.replace(
                pos=qp.pos.at[body_c].set(world_pos),
                rot=qp.rot.at[body_c].set(world_rot),
                ang=qp.ang.at[body_c].set(world_ang),
            )

    # raise trees with no explicit default qp above the ground plane
    # (system.py:215-240)
    fixed = {j.child for j in joint}
    if default:
        fixed |= {dqp.name for dqp in default.qps}
    root_idx = {
        b.name: [i] for i, b in enumerate(config.bodies) if b.name not in fixed
    }
    for j in joint:
        parent = j.parent
        while parent in lineage:
            parent = lineage[parent]
        if parent in root_idx:
            root_idx[parent].append(body_index[j.child])

    for children in root_idx.values():
        zs = jnp.stack([
            _min_z(qp.take(onp.array([c])), config.bodies[c]) for c in children
        ])
        min_z = jnp.min(zs)
        children = onp.array(children)
        pos = jnp.take(qp.pos, children, axis=0) - min_z * jnp.array([0.0, 0.0, 1.0])
        qp = qp.replace(pos=qp.pos.at[children].set(pos))

    return qp


def _min_z(qp: QP, body: cfg.Body) -> Array:
    """Lowest z over a body's colliders (bodies.py:62-98)."""
    pos = qp.pos[0]
    rot = qp.rot[0]
    if not body.colliders:
        return jnp.asarray(0.0)

    result = jnp.asarray(float("inf"))
    for col in body.colliders:
        if col.sphere is not None:
            sphere_pos = maths.rotate(jnp.array(col.position), rot)
            z = pos[2] + sphere_pos[2] - col.sphere.radius
            result = jnp.minimum(result, z)
        elif col.capsule is not None:
            crot = jnp.asarray(_np_euler_to_quat(col.rotation), dtype=jnp.float32)
            axis = maths.rotate(jnp.array([0.0, 0.0, 1.0]), crot)
            length = col.capsule.length / 2 - col.capsule.radius
            for end in (-1, 1):
                sphere_pos = jnp.array(col.position) + end * axis * length
                sphere_pos = maths.rotate(sphere_pos, rot)
                z = pos[2] + sphere_pos[2] - col.capsule.radius
                result = jnp.minimum(result, z)
        elif col.box is not None:
            from brax_tpu.sim.geometry import BOX_CORNERS

            crot = jnp.asarray(_np_euler_to_quat(col.rotation), dtype=jnp.float32)
            corners = jnp.asarray(BOX_CORNERS, dtype=jnp.float32) * jnp.array(col.box.halfsize)
            corners = maths.rotate(corners, crot[None, :]) + jnp.array(col.position)
            corners = maths.rotate(corners, rot[None, :]) + pos
            result = jnp.minimum(result, jnp.min(corners[:, 2]))
        else:
            result = jnp.minimum(result, 0.0)

    return result
