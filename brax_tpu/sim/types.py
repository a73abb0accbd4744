"""Core simulation state types.

A body's state is a maximal-coordinate frame `QP` (position, quaternion
rotation, linear velocity, angular velocity), stored structure-of-arrays with
a leading body axis so that the whole system state is four dense arrays —
ideal for the TPU VPU and for `vmap` over environment batches.

Parity notes: mirrors the reference state layout (brax/physics/base.py:28-153)
but drops the operator-overload algebra in favor of explicit helpers.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as onp
from flax import struct

Array = jax.Array

from brax_tpu import maths


class HArray:
    """Hashable, immutable numpy array for static (non-traced) pytree fields.

    flax.struct static fields participate in jit cache keys, so they must be
    hashable and support ==.  numpy arrays are neither; this wrapper is.
    """

    __slots__ = ("a", "_hash")

    def __init__(self, arr):
        a = onp.asarray(arr)
        a.setflags(write=False)
        object.__setattr__(self, "a", a)
        object.__setattr__(self, "_hash", hash((a.shape, a.dtype.str, a.tobytes())))

    def __eq__(self, other):
        return (
            isinstance(other, HArray)
            and self.a.shape == other.a.shape
            and self.a.dtype == other.a.dtype
            and bool(onp.array_equal(self.a, other.a))
        )

    def __hash__(self):
        return self._hash

    def __array__(self, dtype=None, copy=None):
        return onp.asarray(self.a, dtype=dtype)

    def __repr__(self):
        return f"HArray({self.a!r})"

    @property
    def shape(self):
        return self.a.shape

    def __len__(self):
        return len(self.a)


def harray(arr, dtype=None) -> HArray:
    return HArray(onp.asarray(arr, dtype=dtype))


@struct.dataclass
class QP:
    """Maximal-coordinate state for all bodies: (nb, 3/4) arrays.

    Parity: brax/physics/base.py:75-133.
    """

    pos: Array
    rot: Array
    vel: Array
    ang: Array

    @classmethod
    def zero(cls, shape=()) -> "QP":
        return cls(
            pos=jnp.zeros(shape + (3,)),
            rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), shape + (1,)),
            vel=jnp.zeros(shape + (3,)),
            ang=jnp.zeros(shape + (3,)),
        )

    def take(self, idx) -> "QP":
        """Gathers per-body state along the body axis."""
        from brax_tpu.sim import lowering

        if isinstance(idx, HArray):
            idx = idx.a
        return QP(
            pos=lowering.gather_rows(self.pos, idx),
            rot=lowering.gather_rows(self.rot, idx),
            vel=lowering.gather_rows(self.vel, idx),
            ang=lowering.gather_rows(self.ang, idx),
        )

    def to_world(self, rpos: Array):
        """World position/velocity of body-local point(s) rpos (..., 3).

        Parity: brax/physics/base.py:112-125.
        """
        rpos_off = maths.rotate(rpos, self.rot)
        rvel = jnp.cross(self.ang, rpos_off)
        return self.pos + rpos_off, self.vel + rvel

    def world_velocity(self, pos: Array) -> Array:
        """Velocity of a world-space point on this rigid body.

        Parity: brax/physics/base.py:127-133.
        """
        return self.vel + jnp.cross(self.ang, pos - self.pos)


@struct.dataclass
class DP:
    """Velocity-level deltas (velocity, angular velocity); reference `P`."""

    vel: Array
    ang: Array

    def __add__(self, o: "DP") -> "DP":
        return DP(self.vel + o.vel, self.ang + o.ang)

    @classmethod
    def zero(cls, nb: int) -> "DP":
        return cls(jnp.zeros((nb, 3)), jnp.zeros((nb, 3)))


@struct.dataclass
class DQ:
    """Position-level deltas (position, quaternion); reference `Q`."""

    pos: Array
    rot: Array

    def __add__(self, o: "DQ") -> "DQ":
        return DQ(self.pos + o.pos, self.rot + o.rot)

    @classmethod
    def zero(cls, nb: int) -> "DQ":
        return cls(jnp.zeros((nb, 3)), jnp.zeros((nb, 4)))


@struct.dataclass
class Contact:
    """Contact manifold data, shape (npairs, ncontacts, 3) / (npairs, ncontacts).

    Parity: brax/physics/geometry.py:102-119.
    """

    pos: Array
    vel: Array
    normal: Array
    penetration: Array


@struct.dataclass
class Info:
    """Per-step force/contact telemetry (reference brax/physics/base.py:136-153)."""

    contact: DP
    joint: Any
    actuator: DP
    contact_pos: Array
    contact_normal: Array
    contact_penetration: Array
