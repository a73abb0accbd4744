"""Fetch: a dog-like robot chasing randomized targets.

Behavior parity: /root/reference/brax/envs/fetch.py (reset 42-62, step 64-97,
obs 99-130, random target 132-143).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.fetch import fetch_config
from brax_tpu.sim.types import QP, Info


class Fetch(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        super().__init__(config=fetch_config())
        self.target_idx = self.art.body_index["Target"]
        self.torso_idx = self.art.body_index["Torso"]
        self.target_radius = 2
        self.target_distance = 15

    def reset(self, rng) -> base.State:
        qp = self.default_qp()
        rng, target = self._random_target(rng)
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "hits": zero,
            "weightedHits": zero,
            "movingToTarget": zero,
            "torsoIsUp": zero,
            "torsoHeight": zero,
        }
        return base.State(qp, obs, reward, done, metrics, info={"rng": rng})

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        torso_delta = qp.pos[self.torso_idx] - state.qp.pos[self.torso_idx]
        target_rel = qp.pos[self.target_idx] - qp.pos[self.torso_idx]
        target_dist = maths.safe_norm(target_rel)
        target_dir = target_rel / (1e-6 + target_dist)
        moving_to_target = 0.1 * jnp.dot(torso_delta, target_dir)

        up = jnp.array([0.0, 0.0, 1.0])
        torso_up = maths.rotate(up, qp.rot[self.torso_idx])
        torso_is_up = 0.1 * self.art.config.dt * jnp.dot(torso_up, up)
        torso_height = 0.1 * self.art.config.dt * qp.pos[0, 2]

        fwd = jnp.array([1.0, 0.0, 0.0])
        torso_fwd = maths.rotate(fwd, qp.rot[self.torso_idx])
        torso_facing = jnp.dot(target_dir, torso_fwd)
        target_hit = jnp.where(target_dist < self.target_radius, 1.0, 0.0)
        weighted_hit = target_hit * torso_facing

        reward = torso_height + moving_to_target + torso_is_up + weighted_hit
        state.metrics.update(
            hits=target_hit,
            weightedHits=weighted_hit,
            movingToTarget=moving_to_target,
            torsoIsUp=torso_is_up,
            torsoHeight=torso_height,
        )

        rng, target = self._random_target(state.info["rng"])
        target = jnp.where(target_hit, target, qp.pos[self.target_idx])
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        state.info.update(rng=rng)
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _get_obs(self, qp: QP, info: Info):
        """Egocentric observation of target and the dog's body."""
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
        """Returns a target location in a random circle on the xy plane."""
        rng, rng1, rng2 = jax.random.split(rng, 3)
        dist = self.target_radius + self.target_distance * jax.random.uniform(rng1)
        ang = jnp.pi * 2.0 * jax.random.uniform(rng2)
        target_x = dist * jnp.cos(ang)
        target_y = dist * jnp.sin(ang)
        target_z = 1.0
        target = jnp.array([target_x, target_y, target_z]).transpose()
        return rng, target
