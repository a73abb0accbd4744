"""InvertedDoublePendulum: cartpole with a two-link pole.

Behavior parity: /root/reference/brax/envs/inverted_double_pendulum.py
(reset 92-106, step 108-131, obs 137-144).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.inverted_double_pendulum import (
    inverted_double_pendulum_config,
    inverted_double_pendulum_config_spring,
)
from brax_tpu.sim.types import QP


class InvertedDoublePendulum(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        config = (
            inverted_double_pendulum_config_spring()
            if legacy_spring
            else inverted_double_pendulum_config()
        )
        super().__init__(config=config)

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp)
        reward, done = jnp.zeros(2)
        return base.State(qp, obs, reward, done, {})

    def step(self, state: base.State, action) -> base.State:
        qp, _ = self.sys.step(state.qp, action)
        _, joint_vel = self.sys.joint_angle_vel(qp)

        tip_pos, _ = qp.take(2).to_world(jnp.array([0.0, 0.0, 0.3]))
        x, _, y = tip_pos
        dist_penalty = 0.01 * x**2 + (y - 2) ** 2
        v1, v2 = joint_vel
        vel_penalty = 1e-3 * v1**2 + 5e-3 * v2**2
        alive_bonus = 10.0

        obs = self._get_obs(qp)
        reward = alive_bonus - dist_penalty - vel_penalty
        done = jnp.where(y <= 1, 1.0, 0.0)
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    @property
    def action_size(self):
        return 1

    def _get_obs(self, qp: QP):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        qpos = [qp.pos[0, :1], jnp.sin(joint_angle), jnp.cos(joint_angle)]
        qvel = [qp.vel[0, :1], joint_vel]
        return jnp.concatenate(qpos + qvel)

    def _noise(self, rng):
        return jax.random.uniform(
            rng, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01
        )
