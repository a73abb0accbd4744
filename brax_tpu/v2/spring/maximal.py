"""Maximal-coordinate helpers: CoM frames, world impulses.

Parity with reference brax/v2/spring/maximal.py, batch-first.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2.base import Motion, System, Transform

Array = jax.Array


def maximal_to_com(
    sys: System, x: Transform, xd: Motion
) -> Tuple[Transform, Motion]:
    """Link-frame state -> CoM-frame state."""
    xi = x.do(sys.link.inertia.transform)
    com_transform = Transform(pos=xi.pos, rot=x.rot)
    com_motion = Motion(
        vel=xd.vel + jnp.cross(xd.ang, xi.pos - x.pos), ang=xd.ang
    )
    return com_transform, com_motion


def com_to_maximal(
    x_com: Transform, xd_com: Motion, coord_transform: Transform
) -> Tuple[Transform, Motion]:
    """CoM-frame state -> link-frame state."""
    final_shift = maths.rotate(
        maths.rotate(coord_transform.pos, maths.quat_inv(coord_transform.rot)),
        x_com.rot,
    )
    x = Transform(pos=x_com.pos - final_shift, rot=x_com.rot)
    xd = Motion(
        vel=xd_com.vel - jnp.cross(xd_com.ang, final_shift), ang=xd_com.ang
    )
    return x, xd


def com_inv_inertia(sys: System, x: Transform) -> Array:
    """(n, 3, 3) world-frame inverse rotational inertia at each link CoM."""
    ri = maths.quat_mul(maths.quat_inv(sys.link.inertia.transform.rot), x.rot)
    # rotate the (diagonal-frame) inertia into world: R I R^T via row/col rotate
    i_rot_row = maths.rotate(sys.link.inertia.i, ri[:, None])
    i_rot_col = maths.rotate(jnp.swapaxes(i_rot_row, -1, -2), ri[:, None])
    return maths.inv_3x3(i_rot_col)


def to_world(x: Transform, xd: Motion, rpos: Array) -> Tuple[Array, Array]:
    """World position/velocity of a point rpos relative to the CoM."""
    rpos_off = maths.rotate(rpos, x.rot)
    rvel = jnp.cross(xd.ang, rpos_off)
    return x.pos + rpos_off, xd.vel + rvel


def world_impulse(
    x: Array,
    mass: Array,
    inv_inertia: Array,
    impulse: Array,
    pos: Array,
    torque: Optional[Array],
) -> Motion:
    """Velocity change from an impulse (+ optional torque) at world pos."""
    if torque is None:
        torque = jnp.zeros_like(impulse)
    dvel = impulse / mass[..., None]
    dang = jnp.einsum(
        "...ij,...j->...i", inv_inertia, jnp.cross(pos - x, impulse) + torque
    )
    return Motion(vel=dvel, ang=dang)
