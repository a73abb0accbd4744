"""Generalized-coordinate physics pipeline (reference v2/generalized/pipeline.py).

step: act -> tau -> smooth forces -> constraint forces -> qdd -> integrate ->
FK -> refresh contacts / CoM terms / mass matrix / constraint jacobian.
"""

from __future__ import annotations

import jax.numpy as jnp

from brax_tpu import maths as _maths  # noqa: E402
from brax_tpu.v2 import actuator, geometry, kinematics
from brax_tpu.v2.base import System
from brax_tpu.v2.generalized import constraint, dynamics, integrator, mass
from brax_tpu.v2.generalized.base import State

Array = jnp.ndarray


@_maths.physics_precision
def init(sys: System, q: Array, qd: Array) -> State:
    """Initial pipeline state from joint position/velocity."""
    state = State.zero(sys)
    x, xd = kinematics.forward(sys, q, qd)
    state = state.replace(q=q, qd=qd, x=x, xd=xd)
    state = state.replace(contact=geometry.contact(sys, x))
    state = dynamics.transform_com(sys, state)
    state = mass.matrix_inv(sys, state)
    state = constraint.jacobian(sys, state)
    return state


@_maths.physics_precision
def step(sys: System, state: State, act: Array) -> State:
    """One physics step."""
    tau = actuator.to_tau(sys, act, state.q)
    state = state.replace(qf_smooth=dynamics.forward(sys, state, tau))
    state = state.replace(qf_constraint=constraint.force(sys, state))

    # dof damping folds into M^-1 via the first-order inverse expansion:
    # (A + eX)^-1 ~ A^-1 - e A^-1 X A^-1
    mx_inv = state.mass_mx_inv
    mx_inv_damp = mx_inv - mx_inv @ (jnp.diag(sys.dof.damping) * sys.dt) @ mx_inv
    qdd = mx_inv_damp @ (state.qf_smooth + state.qf_constraint)
    state = state.replace(qdd=qdd)

    q, qd = integrator.integrate(sys, state.q, state.qd, qdd)
    x, xd = kinematics.forward(sys, q, qd)
    state = state.replace(q=q, qd=qd, x=x, xd=xd)
    state = state.replace(contact=geometry.contact(sys, x))
    state = dynamics.transform_com(sys, state)
    state = mass.matrix_inv(sys, state, approximate=True)
    state = constraint.jacobian(sys, state)
    return state
