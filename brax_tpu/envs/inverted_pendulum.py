"""InvertedPendulum: classic cartpole balance.

Behavior parity: /root/reference/brax/envs/inverted_pendulum.py (reset
83-97, step 99-106, obs 112-117).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.inverted_pendulum import (
    inverted_pendulum_config,
    inverted_pendulum_config_spring,
)
from brax_tpu.sim.types import QP, Info


class InvertedPendulum(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        config = (
            inverted_pendulum_config_spring()
            if legacy_spring
            else inverted_pendulum_config()
        )
        super().__init__(config=config)

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp, self.sys.info(qp))
        reward, done = jnp.zeros(2)
        return base.State(qp, obs, reward, done, {})

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)
        reward = jnp.ones(())
        done = jnp.where(jnp.abs(obs[1]) > 0.2, 1.0, 0.0)
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    @property
    def action_size(self):
        return 1

    def _get_obs(self, qp: QP, info: Info):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        return jnp.concatenate([qp.pos[0, :1], joint_angle, qp.vel[0, :1], joint_vel])

    def _noise(self, rng):
        return jax.random.uniform(
            rng, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01
        )
