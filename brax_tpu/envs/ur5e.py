"""UR5e: a 6-dof robot arm reaching random targets with angle actuators.

Behavior parity: /root/reference/brax/envs/ur5e.py (reset 69-87, step 89-120,
obs 122-149, random target 151-162).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.ur5e import ur5e_config
from brax_tpu.sim.types import QP, Info


class Ur5e(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        super().__init__(config=ur5e_config())
        self.target_idx = self.art.body_index["Target"]
        self.torso_idx = self.art.body_index["wrist_3_link"]
        self.target_radius = 0.02
        self.target_distance = 0.5

    def reset(self, rng) -> base.State:
        qp = self.default_qp()
        rng, target = self._random_target(rng)
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        metrics = {"hits": zero, "weightedHits": zero, "movingToTarget": zero}
        return base.State(qp, obs, reward, done, metrics, info={"rng": rng})

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        torso_delta = qp.pos[self.torso_idx] - state.qp.pos[self.torso_idx]
        target_rel = qp.pos[self.target_idx] - qp.pos[self.torso_idx]
        target_dist = maths.safe_norm(target_rel)
        target_dir = target_rel / (1e-6 + target_dist)
        moving_to_target = 0.1 * jnp.dot(torso_delta, target_dir)
        target_hit = jnp.where(target_dist < self.target_radius, 1.0, 0.0)
        weighted_hit = target_hit
        reward = moving_to_target + weighted_hit
        state.metrics.update(
            hits=target_hit,
            weightedHits=weighted_hit,
            movingToTarget=moving_to_target,
        )

        rng, target = self._random_target(state.info["rng"])
        target = jnp.where(target_hit, target, qp.pos[self.target_idx])
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        state.info.update(rng=rng)
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _get_obs(self, qp: QP, info: Info):
        """Egocentric observation of target and arm body."""
        torso_fwd = maths.rotate(jnp.array([1.0, 0.0, 0.0]), qp.rot[self.torso_idx])
        torso_up = maths.rotate(jnp.array([0.0, 0.0, 1.0]), qp.rot[self.torso_idx])
        pos_local = qp.pos - qp.pos[self.torso_idx]
        pos_local = maths.inv_rotate(pos_local, qp.rot[self.torso_idx])
        vel_local = maths.inv_rotate(qp.vel, qp.rot[self.torso_idx])
        target_local = pos_local[self.target_idx]
        target_local_mag = jnp.reshape(maths.safe_norm(target_local), -1)
        target_local_dir = target_local / (1e-6 + target_local_mag)
        pos_local = jnp.reshape(pos_local, -1)
        vel_local = jnp.reshape(vel_local, -1)
        contact_mag = jnp.sum(jnp.square(info.contact.vel), axis=-1)
        contacts = jnp.where(contact_mag > 0.00001, 1.0, 0.0)
        return jnp.concatenate(
            [torso_fwd, torso_up, target_local_mag, target_local_dir, pos_local,
             vel_local, contacts]
        )

    def _random_target(self, rng):
        """Returns a target location in a random circle slightly above xy plane."""
        rng, rng1, rng2 = jax.random.split(rng, 3)
        dist = self.target_radius + self.target_distance * jax.random.uniform(rng1)
        ang = jnp.pi * 2.0 * jax.random.uniform(rng2)
        target_x = dist * jnp.cos(ang)
        target_y = dist * jnp.sin(ang)
        target_z = 0.5
        target = jnp.array([target_x, target_y, target_z]).transpose()
        return rng, target
