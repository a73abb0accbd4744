"""Semi-implicit Euler integration + PBD velocity projection.

All ops are dense over the body axis (and any leading batch axes); frozen
degrees of freedom are handled by static 0/1 masks baked at build time.

Parity: /root/reference/brax/physics/integrators.py:28-147.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from brax_tpu import maths
from brax_tpu.sim.types import QP, DP, DQ, Array


@struct.dataclass
class Integrator:
    pos_mask: Array  # (nb, 3) 1.0 where the dof is live
    rot_mask: Array  # (nb, 3)
    quat_mask: Array  # (nb, 4)
    dt: float = struct.field(pytree_node=False)
    gravity: Array  # (3,)
    velocity_damping: float = struct.field(pytree_node=False)
    angular_damping: float = struct.field(pytree_node=False)

    def kinetic(self, qp: QP) -> QP:
        """Advances position/rotation by current velocities (integrators.py:50-68)."""
        pos = qp.pos + qp.vel * self.dt * self.pos_mask
        rot_at_ang_quat = maths.ang_to_quat(qp.ang * self.rot_mask) * 0.5 * self.dt
        rot = qp.rot + maths.quat_mul(rot_at_ang_quat, qp.rot)
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        return QP(pos=pos, rot=rot, vel=qp.vel, ang=qp.ang)

    def update_acc(self, qp: QP, dp: DP) -> QP:
        """Acceleration-level update with damping + gravity (integrators.py:87-95)."""
        vel = jnp.exp(self.velocity_damping * self.dt) * qp.vel
        vel += (dp.vel + self.gravity) * self.dt
        vel *= self.pos_mask
        ang = jnp.exp(self.angular_damping * self.dt) * qp.ang
        ang += dp.ang * self.dt
        ang *= self.rot_mask
        return QP(pos=qp.pos, rot=qp.rot, vel=vel, ang=ang)

    def update_vel(self, qp: QP, dp: DP) -> QP:
        """Velocity-level update (integrators.py:97-101)."""
        vel = (qp.vel + dp.vel) * self.pos_mask
        ang = (qp.ang + dp.ang) * self.rot_mask
        return QP(pos=qp.pos, rot=qp.rot, vel=vel, ang=ang)

    def update_pos(self, qp: QP, dq: DQ) -> QP:
        """Position-level update (integrators.py:103-110)."""
        return QP(
            pos=qp.pos + dq.pos * self.pos_mask,
            rot=qp.rot + dq.rot * self.quat_mask,
            vel=qp.vel,
            ang=qp.ang,
        )

    def velocity_projection(self, qp: QP, qp_prev: QP) -> QP:
        """PBD velocity projection: velocities from position deltas.

        Parity: integrators.py:122-146.
        """
        new_rot = qp.rot / jnp.linalg.norm(qp.rot, axis=-1, keepdims=True)
        vel = ((qp.pos - qp_prev.pos) / self.dt) * self.pos_mask
        dq = maths.relative_quat(qp_prev.rot, new_rot)
        ang = 2.0 * dq[..., 1:] / self.dt
        scale = jnp.where(dq[..., 0:1] >= 0.0, 1.0, -1.0) * self.rot_mask
        ang = scale * ang * self.rot_mask
        return QP(pos=qp.pos, vel=vel, rot=new_rot, ang=ang)
