"""The compiled physics system and its step functions.

A `System` is a pure pytree of dense arrays compiled from a scene `Config` by
`brax_tpu.sim.builder`.  `step(sys, qp, act)` is a single traceable program:
substeps run under `lax.scan`, constraint groups are dense batches, and all
body updates are scatter-adds with static indices.  Batch over environments
with `jax.vmap(step, in_axes=(None, 0, 0))`; domain-randomize by vmapping over
System leaves as well.

Parity: /root/reference/brax/physics/system.py:244-390 (_pbd_step,
_spring_step, info).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu.sim import actuators as actuators_mod
from brax_tpu.sim import colliders as colliders_mod
from brax_tpu.sim import joints as joints_mod
from brax_tpu.sim.integrator import Integrator
from brax_tpu.sim.types import DP, DQ, QP, Array, Contact, Info


@struct.dataclass
class System:
    """Dense compiled physics system."""

    # --- static metadata ---
    num_bodies: int = struct.field(pytree_node=False)
    num_joints: int = struct.field(pytree_node=False)
    num_joint_dof: int = struct.field(pytree_node=False)
    num_actuators: int = struct.field(pytree_node=False)
    num_forces_dof: int = struct.field(pytree_node=False)
    substeps: int = struct.field(pytree_node=False)
    dynamics_mode: str = struct.field(pytree_node=False)
    num_contacts: int = struct.field(pytree_node=False)
    # contact-point debug telemetry (positions/normals/penetrations) in the
    # per-substep Info is only read by the viewer/debug paths; skipping it in
    # the hot loop saves memory traffic.  Enable with sys.replace(debug=True).
    debug: bool = struct.field(pytree_node=False, default=False)
    # NearNeighbors culling: when > 0, each contact group with more pairs is
    # narrowed to its `collider_cutoff` nearest pairs per step (reference
    # colliders.py:56-89, config.proto collider_cutoff)
    collider_cutoff: int = struct.field(pytree_node=False, default=0)

    # --- traced leaves ---
    mass: Array = None  # (nb,)
    inv_inertia: Array = None  # (nb, 3)
    active: Array = None  # (nb,) 1.0 if affected by physics
    integrator: Integrator = None
    solver: colliders_mod.SolverParams = None
    joint_groups: Tuple[joints_mod.JointGroup, ...] = ()
    actuator_groups: Tuple[actuators_mod.ActuatorGroup, ...] = ()
    force_groups: Tuple[actuators_mod.ForceGroup, ...] = ()
    contact_groups: Tuple[Any, ...] = ()

    @property
    def nb(self) -> int:
        return self.num_bodies

    def step(self, qp: QP, act: Array) -> Tuple[QP, Info]:
        return step(self, qp, act)

    def info(self, qp: QP) -> Info:
        return info(self, qp)

    def joint_angle_vel(self, qp: QP):
        """Concatenated joint angles/velocities across groups (obs helper)."""
        angles, vels = [], []
        for g in self.joint_groups:
            a, v = joints_mod.angle_vel(g, qp)
            angles.append(a)
            vels.append(v)
        return jnp.concatenate(angles, axis=-1), jnp.concatenate(vels, axis=-1)


def _zero_dp(nb: int) -> DP:
    return DP(jnp.zeros((nb, 3)), jnp.zeros((nb, 3)))


def _zero_dq(nb: int) -> DQ:
    return DQ(jnp.zeros((nb, 3)), jnp.zeros((nb, 4)))


def _sum_dp(items, nb: int) -> DP:
    out = _zero_dp(nb)
    for it in items:
        out = out + it
    return out


def _sum_dq(items, nb: int) -> DQ:
    out = _zero_dq(nb)
    for it in items:
        out = out + it
    return out


def _active_groups(sys: System, qp: QP):
    """Contact groups for this step, culled to the nearest pairs if enabled."""
    if not sys.collider_cutoff:
        return sys.contact_groups
    return [
        colliders_mod.cull_nearest(g, qp, sys.collider_cutoff)
        for g in sys.contact_groups
    ]


def _actuator_dp(sys: System, qp: QP, act: Array) -> DP:
    return _sum_dp(
        [
            actuators_mod.apply(a, sys.joint_groups[a.group_index], qp, act, sys.nb)
            for a in sys.actuator_groups
        ],
        sys.nb,
    )


def _force_dp(sys: System, qp: QP, act: Array) -> DP:
    return _sum_dp(
        [actuators_mod.force_apply(f, qp, act, sys.nb) for f in sys.force_groups],
        sys.nb,
    )


def _joint_damp_dp(sys: System, qp: QP) -> DP:
    return _sum_dp(
        [joints_mod.damp(g, qp, sys.nb) for g in sys.joint_groups], sys.nb
    )


def _joint_pbd_dq(sys: System, qp: QP) -> DQ:
    return _sum_dq(
        [joints_mod.pbd_apply(g, qp, sys.nb) for g in sys.joint_groups], sys.nb
    )


def _joint_spring_dp(sys: System, qp: QP) -> DP:
    return _sum_dp(
        [joints_mod.spring_apply(g, qp, sys.nb) for g in sys.joint_groups], sys.nb
    )


def _concat_contact_info(contacts) -> Tuple[Array, Array, Array]:
    """Flattens per-group contact manifolds into padded debug telemetry.

    Parity: system.py:36-43 (_get_contact_info).
    """
    if not contacts:
        z = jnp.zeros((0, 3))
        return z, z, jnp.zeros((0,))
    pos = jnp.concatenate([c.pos.reshape(-1, 3) for c in contacts])
    normal = jnp.concatenate([c.normal.reshape(-1, 3) for c in contacts])
    pen = jnp.concatenate([c.penetration.reshape(-1) for c in contacts])
    return pos, normal, pen


def zero_info(sys: System) -> Info:
    zero = _zero_dp(sys.nb)
    # non-debug placeholder is (1, ...) not (0, ...): zero-sized vectors don't
    # lower through Mosaic when the step runs inside a Pallas kernel
    nc = sys.num_contacts if sys.debug else min(sys.num_contacts, 1)
    return Info(
        contact=zero,
        joint=zero,
        actuator=zero,
        contact_pos=jnp.zeros((nc, 3)),
        contact_normal=jnp.zeros((nc, 3)),
        contact_penetration=-jnp.ones((nc,)),
    )


def step(sys: System, qp: QP, act: Array) -> Tuple[QP, Info]:
    from brax_tpu.sim import kernels

    if kernels.enabled() and not any(
        isinstance(l, jax.core.Tracer) for l in jax.tree_util.tree_leaves(sys)
    ):
        # route through custom_vmap so a whole env batch can dispatch into
        # the fused Pallas kernel (brax_tpu.sim.kernels); needs a concrete
        # System (its parameters bake into the kernel as literals)
        return kernels.custom_step_for(sys)(qp, act)
    return _raw_step(sys, qp, act)


def _raw_step(sys: System, qp: QP, act: Array) -> Tuple[QP, Info]:
    if sys.dynamics_mode == "pbd":
        return _pbd_step(sys, qp, act)
    return _spring_step(sys, qp, act)


def _pbd_step(sys: System, qp: QP, act: Array) -> Tuple[QP, Info]:
    """Position-based dynamics: 2 physics substeps per collision pass.

    Parity: system.py:254-325 (_pbd_step).
    """
    integ = sys.integrator
    nb = sys.nb

    def substep(carry, _):
        qp, info = carry
        qprev = qp

        # -- first half-substep: no collisions --
        dp_a = _actuator_dp(sys, qp, act)
        dp_f = _force_dp(sys, qp, act)
        dp_j = _joint_damp_dp(sys, qp)
        qp = integ.update_acc(qp, dp_a + dp_f + dp_j)
        qp = integ.kinetic(qp)
        dq_j = _joint_pbd_dq(sys, qp)
        qp = integ.update_pos(qp, dq_j)
        qp = integ.velocity_projection(qp, qprev)

        qprev = qp

        # -- second half-substep: with collisions --
        dp_a = _actuator_dp(sys, qp, act)
        dp_f = _force_dp(sys, qp, act)
        dp_j = _joint_damp_dp(sys, qp)
        qp = integ.update_acc(qp, dp_a + dp_f + dp_j)
        qp = integ.kinetic(qp)
        dq_j = _joint_pbd_dq(sys, qp)
        qp = integ.update_pos(qp, dq_j)

        groups = _active_groups(sys, qp)
        collide_data = [
            colliders_mod.position_apply(g, qp, qprev, sys.solver, nb)
            for g in groups
        ]
        dq_c = _sum_dq([c[0] for c in collide_data], nb)
        dlambdas = [c[1] for c in collide_data]
        contacts = [c[2] for c in collide_data]
        qp = integ.update_pos(qp, dq_c)

        qp_right_before = qp
        qp = integ.velocity_projection(qp, qprev)
        dp_c = _sum_dp(
            [
                colliders_mod.velocity_apply(
                    g, qp, dlambdas[i], qp_right_before, contacts[i], sys.solver, nb
                )
                for i, g in enumerate(groups)
            ],
            nb,
        )
        qp = integ.update_vel(qp, dp_c)

        if contacts and sys.debug:
            cpos, cnorm, cpen = _concat_contact_info(contacts)
        else:
            cpos, cnorm, cpen = info.contact_pos, info.contact_normal, info.contact_penetration
        info = Info(
            contact=info.contact + dp_c,
            joint=info.joint,
            actuator=info.actuator + dp_a,
            contact_pos=cpos,
            contact_normal=cnorm,
            contact_penetration=cpen,
        )
        return (qp, info), ()

    info0 = zero_info(sys)
    from brax_tpu.sim import lowering

    if lowering.in_kernel_mode():
        # Mosaic has no scan; unroll in Python
        carry = (qp, info0)
        for _ in range(sys.substeps // 2):
            carry, _ = substep(carry, None)
        qp, info = carry
    else:
        (qp, info), _ = jax.lax.scan(
            substep, (qp, info0), (), length=sys.substeps // 2, unroll=True
        )
    return qp, info


def _spring_step(sys: System, qp: QP, act: Array) -> Tuple[QP, Info]:
    """Legacy spring dynamics (system.py:342-377)."""
    integ = sys.integrator
    nb = sys.nb

    def substep(carry, _):
        qp, info = carry
        qp = integ.kinetic(qp)
        dp_j = _joint_spring_dp(sys, qp)
        dp_a = _actuator_dp(sys, qp, act)
        dp_f = _force_dp(sys, qp, act)
        qp = integ.update_acc(qp, dp_j + dp_a + dp_f)

        collide_data = [
            colliders_mod.spring_apply(g, qp, sys.solver, nb)
            for g in _active_groups(sys, qp)
        ]
        dp_c = _sum_dp([c[0] for c in collide_data], nb)
        contacts = [c[1] for c in collide_data]
        qp = integ.update_vel(qp, dp_c)

        if contacts and sys.debug:
            cpos, cnorm, cpen = _concat_contact_info(contacts)
        else:
            cpos, cnorm, cpen = info.contact_pos, info.contact_normal, info.contact_penetration
        info = Info(
            contact=info.contact + dp_c,
            joint=info.joint + dp_j,
            actuator=info.actuator + dp_a,
            contact_pos=cpos,
            contact_normal=cnorm,
            contact_penetration=cpen,
        )
        return (qp, info), ()

    info0 = zero_info(sys)
    from brax_tpu.sim import lowering

    if lowering.in_kernel_mode():
        carry = (qp, info0)
        for _ in range(sys.substeps):
            carry, _ = substep(carry, None)
        qp, info = carry
    else:
        (qp, info), _ = jax.lax.scan(substep, (qp, info0), (), length=sys.substeps)
    return qp, info


def info(sys: System, qp: QP) -> Info:
    """State telemetry for reset (system.py:327-340, 379-390)."""
    nb = sys.nb
    collide_data = [
        colliders_mod.spring_apply(g, qp, sys.solver, nb) for g in sys.contact_groups
    ]
    dp_c = _sum_dp([c[0] for c in collide_data], nb)
    contacts = [c[1] for c in collide_data]
    if sys.dynamics_mode == "pbd":
        dq_j = _joint_pbd_dq(sys, qp)
    else:
        dq_j = _joint_spring_dp(sys, qp)
    pos, normal, pen = _concat_contact_info(contacts)
    if not contacts:
        z = zero_info(sys)
        pos, normal, pen = z.contact_pos, z.contact_normal, z.contact_penetration
    return Info(
        contact=dp_c,
        joint=dq_j,
        actuator=_zero_dp(nb),
        contact_pos=pos,
        contact_normal=normal,
        contact_penetration=pen,
    )
