"""Hopper: a 2D one-legged robot rewarded for hopping in +x.

Behavior parity with the reference env (/root/reference/brax/envs/hopper.py:
reset 175-193, step 195-233, obs 235-250).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.hopper import hopper_config
from brax_tpu.sim.types import QP


class Hopper(base.Env):

    def __init__(
        self,
        forward_reward_weight=1.0,
        ctrl_cost_weight=1e-3,
        healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.7, float("inf")),
        healthy_angle_range=(-0.2, 0.2),
        reset_noise_scale=5e-3,
        exclude_current_positions_from_observation=True,
        **kwargs,
    ):
        super().__init__(config=hopper_config())
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._healthy_angle_range = healthy_angle_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "reward_forward": zero,
            "reward_ctrl": zero,
            "reward_healthy": zero,
            "x_position": zero,
            "x_velocity": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, _ = self.sys.step(state.qp, action)

        x_velocity = (qp.pos[0, 0] - state.qp.pos[0, 0]) / self.art.config.dt
        forward_reward = self._forward_reward_weight * x_velocity

        min_z, max_z = self._healthy_z_range
        min_angle, max_angle = self._healthy_angle_range
        ang_y = maths.quat_to_euler(qp.rot[0])[1]
        is_healthy = jnp.where(qp.pos[0, 2] < min_z, 0.0, 1.0)
        is_healthy = jnp.where(qp.pos[0, 2] > max_z, 0.0, is_healthy)
        is_healthy = jnp.where(ang_y > max_angle, 0.0, is_healthy)
        is_healthy = jnp.where(ang_y < min_angle, 0.0, is_healthy)
        if self._terminate_when_unhealthy:
            healthy_reward = self._healthy_reward
        else:
            healthy_reward = self._healthy_reward * is_healthy

        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))
        obs = self._get_obs(qp)
        reward = forward_reward + healthy_reward - ctrl_cost
        done = 1.0 - is_healthy if self._terminate_when_unhealthy else 0.0
        state.metrics.update(
            reward_forward=forward_reward,
            reward_ctrl=-ctrl_cost,
            reward_healthy=healthy_reward,
            x_position=qp.pos[0, 0],
            x_velocity=x_velocity,
        )
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    def _get_obs(self, qp: QP):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        ang_y = maths.quat_to_euler(qp.rot[0])[1:2]

        if self._exclude_current_positions_from_observation:
            qpos = [qp.pos[0, 2:], ang_y, joint_angle]
        else:
            qpos = [qp.pos[0, jnp.array([0, 2])], ang_y, joint_angle]
        qvel = [qp.vel[0, jnp.array([0, 2])], qp.ang[0, 1:2], joint_vel]
        return jnp.concatenate(qpos + qvel)

    def _noise(self, rng):
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        return jax.random.uniform(rng, (self.sys.num_joint_dof,), minval=low, maxval=hi)
