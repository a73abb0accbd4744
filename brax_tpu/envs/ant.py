"""Ant: a 4-legged robot rewarded for running in +x.

Behavior parity with the reference env (/root/reference/brax/envs/ant.py:
reset 198-220, step 222-255, obs 257-282); scene config ported as data in
brax_tpu/envs/assets/ant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.ant import ant_config, ant_config_spring
from brax_tpu.sim.types import QP, Info


class Ant(base.Env):

    def __init__(
        self,
        ctrl_cost_weight=0.5,
        use_contact_forces=False,
        contact_cost_weight=5e-4,
        healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.2, 1.0),
        reset_noise_scale=0.1,
        exclude_current_positions_from_observation=True,
        legacy_spring=False,
        **kwargs,
    ):
        config = ant_config_spring() if legacy_spring else ant_config()
        super().__init__(config=config)
        self._ctrl_cost_weight = ctrl_cost_weight
        self._use_contact_forces = use_contact_forces
        self._contact_cost_weight = contact_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp, self.sys.info(qp))
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "reward_forward": zero,
            "reward_survive": zero,
            "reward_ctrl": zero,
            "reward_contact": zero,
            "x_position": zero,
            "y_position": zero,
            "distance_from_origin": zero,
            "x_velocity": zero,
            "y_velocity": zero,
            "forward_reward": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)

        velocity = (qp.pos[0] - state.qp.pos[0]) / self.art.config.dt
        forward_reward = velocity[0]

        min_z, max_z = self._healthy_z_range
        is_healthy = jnp.where(qp.pos[0, 2] < min_z, 0.0, 1.0)
        is_healthy = jnp.where(qp.pos[0, 2] > max_z, 0.0, is_healthy)
        if self._terminate_when_unhealthy:
            healthy_reward = self._healthy_reward
        else:
            healthy_reward = self._healthy_reward * is_healthy
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))
        contact_cost = self._contact_cost_weight * jnp.sum(
            jnp.square(jnp.clip(info.contact.vel, -1, 1))
        )
        obs = self._get_obs(qp, info)
        reward = forward_reward + healthy_reward - ctrl_cost - contact_cost
        done = 1.0 - is_healthy if self._terminate_when_unhealthy else 0.0
        state.metrics.update(
            reward_forward=forward_reward,
            reward_survive=healthy_reward,
            reward_ctrl=-ctrl_cost,
            reward_contact=-contact_cost,
            x_position=qp.pos[0, 0],
            y_position=qp.pos[0, 1],
            distance_from_origin=jnp.linalg.norm(qp.pos[0]),
            x_velocity=velocity[0],
            y_velocity=velocity[1],
            forward_reward=forward_reward,
        )
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    def _get_obs(self, qp: QP, info: Info):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)

        if self._exclude_current_positions_from_observation:
            qpos = [qp.pos[0, 2:], qp.rot[0], joint_angle]
        else:
            qpos = [qp.pos[0], qp.rot[0], joint_angle]
        qvel = [qp.vel[0], qp.ang[0], joint_vel]

        if self._use_contact_forces:
            cfrc = [
                jnp.clip(info.contact.vel, -1, 1).reshape(-1),
                jnp.clip(info.contact.ang, -1, 1).reshape(-1),
            ]
        else:
            cfrc = []

        return jnp.concatenate(qpos + qvel + cfrc)

    def _noise(self, rng):
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        return jax.random.uniform(
            rng, (self.sys.num_joint_dof,), minval=low, maxval=hi
        )
