"""Halfcheetah: a 2D cheetah rewarded for running in +x.

Behavior parity with the reference env (/root/reference/brax/envs/
half_cheetah.py: reset 164-180, step 182-198, obs 200-218); scene config
ported as data in brax_tpu/envs/assets/half_cheetah.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.half_cheetah import halfcheetah_config, halfcheetah_config_spring
from brax_tpu.sim.types import QP, Info


class Halfcheetah(base.Env):

    def __init__(
        self,
        forward_reward_weight=1.0,
        ctrl_cost_weight=0.1,
        reset_noise_scale=0.1,
        legacy_spring=False,
        exclude_current_positions_from_observation=True,
        **kwargs,
    ):
        config = halfcheetah_config_spring() if legacy_spring else halfcheetah_config()
        super().__init__(config=config)
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
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
            "x_position": zero,
            "x_velocity": zero,
            "reward_ctrl": zero,
            "reward_run": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)

        velocity = (qp.pos[0] - state.qp.pos[0]) / self.art.config.dt
        forward_reward = self._forward_reward_weight * velocity[0]
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        obs = self._get_obs(qp, info)
        reward = forward_reward - ctrl_cost
        state.metrics.update(
            x_position=qp.pos[0, 0],
            x_velocity=velocity[0],
            reward_run=forward_reward,
            reward_ctrl=-ctrl_cost,
        )
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _get_obs(self, qp: QP, info: Info):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)

        if self._exclude_current_positions_from_observation:
            qpos = [qp.pos[0, 2:], qp.rot[0, jnp.array([0, 2])], joint_angle]
        else:
            qpos = [qp.pos[0, jnp.array([0, 2])], qp.rot[0, jnp.array([0, 2])], joint_angle]
        qvel = [qp.vel[0, jnp.array([0, 2])], qp.ang[0, 1:2], joint_vel]
        return jnp.concatenate(qpos + qvel)

    def _noise(self, rng):
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        return jax.random.uniform(rng, (self.sys.num_joint_dof,), minval=low, maxval=hi)
