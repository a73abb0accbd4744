"""Grasp: a claw hand picking up a ball and carrying it to random targets.

Behavior parity: /root/reference/brax/envs/grasp.py (action rescaling 45-56,
reset 58-71, step 73-141, obs 147-201, random target 203-214).  The palm is
kinematically translated toward an action-specified target position each step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.grasp import grasp_config
from brax_tpu.sim.types import QP, Info


class Grasp(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        super().__init__(config=grasp_config())
        self.object_idx = self.art.body_index["Object"]
        self.target_idx = self.art.body_index["Target"]
        self.hand_idx = self.art.body_index["HandThumbProximal"]
        self.palm_idx = self.art.body_index["HandPalm"]
        self.target_radius = 1.1
        self.target_distance = 10.0
        self.target_height = 8.0

        limits = []
        for j in self.art.config.joints:
            for lo, hi in j.angle_limits:
                limits.append((lo, hi))
        self._min_act = jnp.array([l[0] for l in limits])
        self._range_act = jnp.array([l[1] - l[0] for l in limits])
        self._min_act = jnp.concatenate([self._min_act, jnp.array([-10.0, -10.0, 3.5])])
        self._range_act = jnp.concatenate([self._range_act, jnp.array([20.0, 20.0, 10.0])])

    def reset(self, rng) -> base.State:
        qp = self.default_qp()
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "hits": zero,
            "touchingObject": zero,
            "movingToObject": zero,
            "movingObjectToTarget": zero,
            "closeToObject": zero,
        }
        return base.State(qp, obs, reward, done, metrics, info={"rng": rng})

    def step(self, state: base.State, action) -> base.State:
        action = self._min_act + self._range_act * ((action + 1) / 2.0)

        # move the hand palm toward the action-specified position
        target_pos = action[-3:]
        palm_pos = state.qp.pos[self.palm_idx]
        norm = maths.safe_norm(target_pos - palm_pos)
        # max() guards the untaken branch: where()'s VJP evaluates 2/norm
        # even when norm <= 2, and norm is exactly 0 at symmetric states
        scale = jnp.where(norm > 2.0, 2.0 / jnp.maximum(norm, 1e-6), 1.0)
        palm_pos = palm_pos + scale * (target_pos - palm_pos) * 0.15
        pos = state.qp.pos.at[self.palm_idx].set(palm_pos)
        qp = state.qp.replace(pos=pos)

        qp, info = self.sys.step(qp, action)
        obs = self._get_obs(qp, info)

        object_pos = qp.pos[self.object_idx]
        hand_pos = qp.pos[self.palm_idx]
        hand_vel = qp.vel[self.hand_idx]
        object_rel = object_pos - hand_pos
        object_dist = maths.safe_norm(object_rel)
        # safe_norm: the object starts exactly under the palm, and norm's
        # gradient at an exact-zero vector is NaN (APG config 4 blocker)
        planar_object_dist = maths.safe_norm(object_rel * jnp.array([1.0, 1.0, 0.0]))
        object_dir = object_rel / (1e-6 + object_dist.reshape(-1))
        moving_to_object = 0.1 * self.art.config.dt * jnp.dot(hand_vel, object_dir)
        close_to_object = 0.1 * self.art.config.dt * 1.0 / (1.0 + planar_object_dist)

        target_pos = qp.pos[self.target_idx]
        object_vel = qp.vel[self.object_idx]
        target_rel = target_pos - object_pos
        target_dist = maths.safe_norm(target_rel)
        target_dir = target_rel / (1e-6 + target_dist)
        moving_to_target = 1.5 * self.art.config.dt * jnp.dot(object_vel, target_dir)

        contact_mag = jnp.sum(jnp.square(info.contact.vel), axis=-1)
        contacts = jnp.where(contact_mag > 0.00001, 1.0, 0.0)
        touching_object = 0.2 * self.art.config.dt * (
            contacts[3] + contacts[9] + contacts[12] + contacts[15]
        )
        target_hit = jnp.where(target_dist < self.target_radius, 1.0, 0.0)

        reward = (
            moving_to_object
            + close_to_object
            + touching_object
            + 5.0 * target_hit
            + moving_to_target
        )
        state.metrics.update(
            hits=target_hit,
            touchingObject=touching_object,
            movingToObject=moving_to_object,
            movingObjectToTarget=moving_to_target,
            closeToObject=close_to_object,
        )

        rng, target = self._random_target(state.info["rng"])
        target = jnp.where(target_hit, target, qp.pos[self.target_idx])
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        state.info.update(rng=rng)
        return state.replace(qp=qp, obs=obs, reward=reward)

    @property
    def action_size(self) -> int:
        return super().action_size + 3  # 3 extra actions for palm translation

    def _get_obs(self, qp: QP, info: Info):
        """Egocentric observation of target, object, and hand."""
        pos_local = qp.pos - qp.pos[self.palm_idx]
        pos_local = maths.inv_rotate(pos_local, qp.rot[self.palm_idx])
        vel_local = maths.inv_rotate(qp.vel, qp.rot[self.palm_idx])

        object_local = pos_local[self.object_idx]
        object_local_mag = maths.safe_norm(object_local).reshape(-1)
        object_local_dir = object_local / (1e-6 + object_local_mag)

        hand_to_obj = qp.pos[self.object_idx] - qp.pos[self.palm_idx]
        hand_to_obj_mag = maths.safe_norm(hand_to_obj)
        hand_to_obj_dir = hand_to_obj / (1e-6 + hand_to_obj_mag)
        hand_vel = qp.vel[self.hand_idx]
        heading_to_obj = jnp.dot(hand_to_obj_dir, hand_vel).reshape(-1)

        target_local = pos_local[self.target_idx]
        target_local_mag = maths.safe_norm(target_local).reshape(-1)
        target_local_dir = target_local / (1e-6 + target_local_mag)

        obj_to_target = qp.pos[self.target_idx] - qp.pos[self.object_idx]
        obj_to_target_mag = maths.safe_norm(obj_to_target).reshape(-1)
        obj_to_target_dir = obj_to_target / (1e-6 + obj_to_target_mag)

        object_vel = qp.vel[self.object_idx]
        obj_heading_to_target = jnp.dot(obj_to_target_dir, object_vel).reshape(-1)

        pos_local = pos_local.reshape(-1)
        vel_local = vel_local.reshape(-1)

        contact_mag = jnp.sum(jnp.square(info.contact.vel), axis=-1)
        contacts = jnp.where(contact_mag > 0.00001, 1.0, 0.0)

        return jnp.concatenate(
            [
                object_local_mag, object_local_dir, target_local_mag,
                target_local_dir, pos_local, vel_local, hand_to_obj, hand_vel,
                heading_to_obj, obj_to_target_mag, obj_to_target_dir,
                obj_heading_to_target, contacts,
            ]
        )

    def _random_target(self, rng):
        """Returns a new random target location in a circle above the xy plane."""
        rng, rng1, rng2, rng3 = jax.random.split(rng, 4)
        dist = self.target_radius + self.target_distance * jax.random.uniform(rng1)
        ang = jnp.pi * 2.0 * jax.random.uniform(rng2)
        target_x = dist * jnp.cos(ang)
        target_y = dist * jnp.sin(ang)
        target_z = self.target_height * jax.random.uniform(rng3)
        target = jnp.array([target_x, target_y, target_z]).transpose()
        return rng, target
