"""State for the generalized pipeline (reference brax/v2/generalized/base.py)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from brax_tpu.v2 import base
from brax_tpu.v2.base import Inertia, Motion, System, Transform


@struct.dataclass
class State(base.State):
    """Generalized state: base State plus CoM-frame and solver terms.

    com: subtree center of mass; cinr: inertia in com frame; cd: link
    velocities in com frame; cdof/cdofd: dofs and their velocities in com
    frame; mass_mx(_inv): joint-space mass matrix; con_jac/pos/diag:
    constraint jacobian rows; qf_smooth/constraint: smooth and constraint
    forces; qdd: joint acceleration.
    """

    com: jnp.ndarray
    cinr: Inertia
    cd: Motion
    cdof: Motion
    cdofd: Motion
    mass_mx: jnp.ndarray
    mass_mx_inv: jnp.ndarray
    con_jac: jnp.ndarray
    con_pos: jnp.ndarray
    con_diag: jnp.ndarray
    qf_smooth: jnp.ndarray
    qf_constraint: jnp.ndarray
    qdd: jnp.ndarray

    @classmethod
    def zero(cls, sys: System) -> "State":
        n, nd = sys.num_links(), sys.qd_size()
        return State(
            q=jnp.zeros(sys.q_size()),
            qd=jnp.zeros(nd),
            x=Transform.zero((n,)),
            xd=Motion.zero((n,)),
            contact=None,
            com=jnp.zeros(3),
            cinr=Inertia(
                transform=Transform.zero((n,)),
                i=jnp.zeros((n, 3, 3)),
                mass=jnp.zeros((n,)),
            ),
            cd=Motion.zero((n,)),
            cdof=Motion.zero((nd,)),
            cdofd=Motion.zero((nd,)),
            mass_mx=jnp.eye(nd),
            mass_mx_inv=jnp.eye(nd),
            con_jac=jnp.zeros(()),
            con_pos=jnp.zeros(()),
            con_diag=jnp.zeros(()),
            qf_smooth=jnp.zeros((nd,)),
            qf_constraint=jnp.zeros((nd,)),
            qdd=jnp.zeros(nd),
        )
