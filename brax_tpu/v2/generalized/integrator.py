"""Semi-implicit Euler integration in joint coordinates.

Parity with reference brax/v2/generalized/integrator.py: velocities update
first, then positions; free-joint quaternions advance by the exact axis-angle
exponential of the angular velocity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import scan
from brax_tpu.v2.base import System

Array = jax.Array


def _integrate_free(dt, q: Array, qd: Array) -> Array:
    """(n, 7) free-joint q advance: position + quaternion exponential."""
    pos, rot = q[:, 0:3], q[:, 3:7]
    vel, ang = qd[:, 0:3], qd[:, 3:6]
    ang_norm = jnp.linalg.norm(ang, axis=-1, keepdims=True) + 1e-8
    axis = ang / ang_norm
    angle = dt * ang_norm[..., 0]
    qrot = maths.quat_rot_axis(axis, angle)
    rot = maths.quat_mul(rot, qrot)
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return jnp.concatenate([pos + vel * dt, rot], axis=-1)


def integrate(
    sys: System, q: Array, qd: Array, qdd: Array
) -> Tuple[Array, Array]:
    """One semi-implicit Euler step of (q, qd) given qdd."""
    qd = qd + qdd * sys.dt

    def q_fn(typ, link, q, qd):
        n = link.transform.pos.shape[0]
        q = q.reshape((n, -1))
        qd = qd.reshape((n, -1))
        if typ == "f":
            return _integrate_free(sys.dt, q, qd).reshape(-1)
        return (q + qd * sys.dt).reshape(-1)

    q = scan.link_types(sys, q_fn, "lqd", "q", sys.link, q, qd)
    return q, qd
