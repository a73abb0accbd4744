"""Spring physics pipeline (reference brax/v2/spring/pipeline.py).

step: joint spring forces + actuator world forces -> CoM-frame acceleration
integration -> contact impulse resolution -> back to link frame -> inverse
kinematics to refresh (q, qd).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu import maths as _maths  # noqa: E402
from brax_tpu.v2 import actuator, base, geometry, kinematics
from brax_tpu.v2.base import System, Transform
from brax_tpu.v2.spring import collisions, integrator, joints, maximal

Array = jax.Array


@struct.dataclass
class State(base.State):
    """Spring pipeline state (q, qd, x, xd, contact)."""


@_maths.physics_precision
def init(sys: System, q: Array, qd: Array) -> State:
    """Initial state from joint position/velocity."""
    x, xd = kinematics.forward(sys, q, qd)
    contact = geometry.contact(sys, x)
    return State(q, qd, x, xd, contact)


@_maths.physics_precision
def step(sys: System, state: State, act: Array) -> State:
    """One spring-dynamics step."""
    x, xd = state.x, state.xd

    # joint springs + actuators as world-frame forces
    f_j, pos_j, link_idx_j = joints.resolve(sys, x, xd)
    tau_local = actuator.to_tau(sys, act, state.q)
    f_a, pos_a, link_idx_a = actuator.to_tau_world(sys, state.q, tau_local)

    # move into CoM coordinates
    xi, xdi = maximal.maximal_to_com(sys, x, xd)
    coord_transform = Transform(pos=xi.pos - x.pos, rot=x.rot)
    inv_inertia = maximal.com_inv_inertia(sys, x)

    f = jax.tree_util.tree_map(lambda a, b: jnp.vstack([a, b]), f_j, f_a)
    pos = jnp.concatenate([pos_j, pos_a])
    link_idxs = jnp.concatenate([link_idx_j, link_idx_a])

    xdi = integrator.forward(sys, xi, xdi, inv_inertia, f=f, pos=pos, link_idx=link_idxs)

    # collisions at velocity level
    contact = geometry.contact(sys, x)
    p_c, pos_c, link_idx_c = collisions.resolve(sys, xi, xdi, inv_inertia, contact)
    xi, xdi = integrator.forward_c(
        sys, xi, xdi, inv_inertia, p=p_c, pos=pos_c, link_idx=link_idx_c
    )

    x, xd = maximal.com_to_maximal(xi, xdi, coord_transform)
    q, qd = kinematics.inverse(sys, x, xd)
    return State(q, qd, x, xd, contact)
