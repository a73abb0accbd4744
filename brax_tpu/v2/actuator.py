"""Actuator force conversion for the v2 pipelines.

Parity: reference brax/v2/actuator.py (to_tau joint-space forces; to_tau_world
world-frame forces for the maximal-coordinate spring/positional backends).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import kinematics, scan
from brax_tpu.v2.base import Motion, System, Transform

Array = jax.Array


def to_tau(sys: System, act: Array, q: Array) -> Array:
    """Actuator input -> generalized joint force tau.

    'm'otor actuators apply gear * ctrl directly; 'p'osition actuators are a
    proportional servo toward the control setpoint.  Parity: reference
    actuator.py:28-59.
    """
    if sys.act_size() == 0:
        return jnp.zeros(sys.qd_size())

    def act_fn(act_type, act, actuator, q, qd_idx):
        if act_type not in ("p", "m"):
            raise RuntimeError(f"unrecognized act type: {act_type}")
        force = jnp.clip(act, actuator.ctrl_range[:, 0], actuator.ctrl_range[:, 1])
        if act_type == "p":
            force -= q  # position servo bias
        return actuator.gear * force, qd_idx

    qd_idx = jnp.arange(sys.qd_size())
    tau, qd_idx = scan.actuator_types(
        sys, act_fn, "aaqd", "a", act, sys.actuator, q, qd_idx
    )
    return jnp.zeros(sys.qd_size()).at[qd_idx].add(tau)


def to_tau_world(
    sys: System, q: Array, tau: Array
) -> Tuple[Motion, Array, Array]:
    """Joint-space tau -> paired world-frame forces on child and parent links.

    Returns (forces, application points, link indices); rows [0, n) push the
    child link at its joint anchor, rows [n, 2n) push the parent back.
    Parity: reference actuator.py:62-129.
    """

    def jcalc(typ, q, tau, motion):
        if typ == "f":
            q = q.reshape((-1, 7))
            return Motion(
                ang=jnp.zeros((q.shape[0], 3)), vel=jnp.zeros((q.shape[0], 3))
            )
        rot, _ = maths.normalize_with_norm(maths.quat_rot_axis(motion.ang, q))
        j = Transform(pos=motion.vel * q[:, None], rot=rot)
        t = Motion(ang=motion.ang * tau[:, None], vel=motion.vel * tau[:, None])

        num_dofs = int(typ)
        s = (-1, num_dofs)
        j_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), j)
        t_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), t)

        j = jax.tree_util.tree_map(lambda x: x[:, 0], j_stack)
        t = jax.tree_util.tree_map(lambda x: x[:, 0], t_stack)
        for i in range(1, num_dofs):
            j_i = jax.tree_util.tree_map(lambda x: x[:, i], j_stack)
            t_i = jax.tree_util.tree_map(lambda x: x[:, i], t_stack)
            j = j.do(j_i)
            t = t + Motion(
                ang=maths.rotate(t_i.ang, j_i.rot),
                vel=maths.rotate(t_i.vel, j_i.rot),
            )
        return t

    p_idx = jnp.array(sys.link_parents)
    c_idx = jnp.arange(sys.num_links())

    x, _ = kinematics.forward(sys, q, jnp.zeros(sys.qd_size()))
    x_pad = x.concatenate(Transform.zero((1,)))
    x_p = x_pad.take(p_idx)
    x_c = x.do(sys.link.joint)
    x_joint = x_p.do(sys.link.transform).do(sys.link.joint)

    f_a = scan.link_types(sys, jcalc, "qdd", "l", q, tau, sys.dof.motion)

    f_a = jax.tree_util.tree_map(lambda a: jnp.vstack([a, -a]), f_a)
    pos = jnp.vstack((x_c.pos, x_joint.pos))
    link_idx = jnp.hstack((c_idx, p_idx))
    f_a = f_a * (link_idx.reshape((-1, 1)) != -1)
    return f_a, pos, link_idx
