"""Acrobot: a two-link pendulum swung by a single elbow actuator.

Behavior parity: /root/reference/brax/envs/acrobot.py (reset 69-88, step
90-107, obs 113-116).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.acrobot import acrobot_config


class Acrobot(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        super().__init__(config=acrobot_config())

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01
        )
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01
        )
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        obs = self._get_obs(joint_angle, joint_vel)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "dist_penalty": zero,
            "vel_penalty": zero,
            "alive_bonus": zero,
            "r_tot": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, _ = self.sys.step(state.qp, action)
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        obs = self._get_obs(joint_angle, joint_vel)

        alive_bonus = 10.0
        dist_penalty = joint_angle[0] ** 2 + joint_angle[1] ** 2
        vel_penalty = 1e-3 * (joint_vel[0] ** 2 + joint_vel[1] ** 2)
        reward = alive_bonus - dist_penalty - vel_penalty
        done = jnp.zeros(())
        state.metrics.update(
            dist_penalty=dist_penalty, vel_penalty=vel_penalty, r_tot=reward
        )
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    @property
    def action_size(self):
        return 1

    def _get_obs(self, joint_angle, joint_vel):
        return jnp.concatenate((joint_angle, joint_vel))
