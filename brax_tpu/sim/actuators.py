"""Dense batched actuators and direct forces.

Each `ActuatorGroup` actuates a subset of one joint group; the act vector is
gathered with a static index table (with -1 padding masked out, mirroring the
sphericalization padding in the reference: brax/physics/actuators.py:126-145).

Parity: brax/physics/actuators.py (Angle/Torque) and forces.py
(Thruster/Twister).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as onp
from flax import struct

from brax_tpu import maths
from brax_tpu.sim import joints as joints_mod
from brax_tpu.sim import lowering
from brax_tpu.sim.types import DP, QP, Array, HArray


@struct.dataclass
class ActuatorGroup:
    kind: str = struct.field(pytree_node=False)  # 'torque' | 'angle'
    group_index: int = struct.field(pytree_node=False)  # which joint group
    joint_sel: HArray = struct.field(pytree_node=False)  # (na,) indices into the joint group
    act_index: HArray = struct.field(pytree_node=False)  # (na, dof) with -1 padding
    strength: Array = None  # (na,)

    @property
    def n(self) -> int:
        return len(self.joint_sel)


def apply(a: ActuatorGroup, g: joints_mod.JointGroup, qp: QP, act: Array, nb: int) -> DP:
    """Applies actuator torques to the joint's parent/child bodies.

    Parity: brax/physics/actuators.py:52-112.
    """
    sub = _take_group(g, a.joint_sel)
    qp_p = qp.take(sub.parent)
    qp_c = qp.take(sub.child)

    act_mask = jnp.asarray(a.act_index.a >= 0, dtype=jnp.float32)
    act_g = lowering.gather_last(act, onp.clip(a.act_index.a, 0, None)) * act_mask

    axes, angles = joints_mod.axis_angle(sub, qp_p, qp_c)  # (na, dof, 3), (na, dof)
    limit_min = sub.limit[..., 0]  # (na, dof)
    limit_max = sub.limit[..., 1]

    if a.kind == "angle":
        target = jnp.clip(act_g * jnp.pi / 180, limit_min, limit_max)
        torque_scalar = (target - angles) * a.strength[..., None]
        torque = jnp.sum(axes * torque_scalar[..., None], axis=-2)
        dang_p = -sub.inertia_p * torque
        dang_c = sub.inertia_c * torque
    elif a.kind == "torque":
        # -1 so that positive actuation increases the parent-child angle
        torque_scalar = act_g * a.strength[..., None] * -1.0
        torque_scalar = jnp.where(angles < limit_min, 0, torque_scalar)
        torque_scalar = jnp.where(angles > limit_max, 0, torque_scalar)
        torque = jnp.sum(axes * torque_scalar[..., None], axis=-2)
        dang_p = sub.inertia_p * torque
        dang_c = -sub.inertia_c * torque
    else:
        raise ValueError(f"unknown actuator kind: {a.kind}")

    dang = joints_mod._scatter_add3(dang_p, dang_c, sub.parent, sub.child, nb)
    return DP(vel=jnp.zeros((nb, 3)), ang=dang)


def _take_group(g: joints_mod.JointGroup, sel: HArray) -> joints_mod.JointGroup:
    """Selects a subset of joints from a group (static selection)."""
    s = sel.a

    def tk(x):
        return None if x is None else lowering.gather_rows(x, s)

    return joints_mod.JointGroup(
        kind=g.kind,
        dof=g.dof,
        parent=HArray(g.parent.a[s]),
        child=HArray(g.child.a[s]),
        free_dofs=None,
        off_p=tk(g.off_p),
        off_c=tk(g.off_c),
        limit=tk(g.limit),
        axis_c=tk(g.axis_c),
        axis_p=tk(g.axis_p),
        angular_damping=tk(g.angular_damping),
        scale_pos=tk(g.scale_pos),
        scale_ang=tk(g.scale_ang),
        mass_p=tk(g.mass_p),
        mass_c=tk(g.mass_c),
        inertia_p=tk(g.inertia_p),
        inertia_c=tk(g.inertia_c),
        stiffness=tk(g.stiffness),
        spring_damping=tk(g.spring_damping),
        limit_strength=tk(g.limit_strength),
    )


@struct.dataclass
class ForceGroup:
    """Direct linear force (thruster) or torque (twister) on bodies.

    Parity: brax/physics/forces.py:27-107.
    """

    kind: str = struct.field(pytree_node=False)  # 'thruster' | 'twister'
    body: HArray = struct.field(pytree_node=False)  # (nf,)
    act_index: HArray = struct.field(pytree_node=False)  # (nf, 3)
    strength: Array = None  # (nf,)
    mass: Array = None  # (nf,)

    @property
    def n(self) -> int:
        return len(self.body)


def force_apply(f: ForceGroup, qp: QP, act: Array, nb: int) -> DP:
    # mode="clip" matches the reference's jumpy.take (jumpy.py:146-152); envs
    # like inverted_pendulum pass a shorter action vector than the force act
    # indices span, relying on clipping (action_size is overridden to 1)
    force_data = lowering.gather_last(act, f.act_index.a)  # (nf, 3)
    d = force_data * f.strength[..., None] / f.mass[..., None]
    zeros = jnp.zeros_like(d)
    if f.kind == "thruster":
        dvel, dang = d, zeros
    else:
        dvel, dang = zeros, d
    vel = lowering.scatter_add_rows(jnp.zeros((nb, 3)), f.body.a, dvel)
    ang = lowering.scatter_add_rows(jnp.zeros((nb, 3)), f.body.a, dang)
    return DP(vel=vel, ang=ang)
