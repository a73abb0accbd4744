"""HumanoidStandup: a humanoid rewarded for standing up from the ground.

Behavior parity: /root/reference/brax/envs/humanoid_standup.py (reset
163-180, step 182-204, obs 206-249).  Shares the humanoid obs layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.humanoid_standup import (
    humanoid_standup_config,
    humanoid_standup_config_spring,
)
from brax_tpu.envs.humanoid import HumanoidLegacy


class HumanoidStandup(HumanoidLegacy):

    def __init__(self, legacy_spring=False, **kwargs):
        config = (
            humanoid_standup_config_spring()
            if legacy_spring
            else humanoid_standup_config()
        )
        base.Env.__init__(self, config=config)
        self._reset_noise_scale = 1e-2
        # the standup obs always excludes xy (reference
        # humanoid_standup.py:212-216 uses qp.pos[0, 2:] unconditionally)
        self._exclude_current_positions_from_observation = True

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp, self.sys.info(qp), jnp.zeros(self.action_size))
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "reward_linup": zero,
            "reward_quadctrl": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        pos_after = qp.pos[0, 2]  # z coordinate of torso
        uph_cost = (pos_after - 0) / self.art.config.dt
        quad_ctrl_cost = 0.01 * jnp.sum(jnp.square(action))
        obs = self._get_obs(qp, info, action)
        reward = uph_cost + 1 - quad_ctrl_cost
        state.metrics.update(
            reward_linup=uph_cost,
            reward_quadctrl=-quad_ctrl_cost,
        )
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _noise(self, rng):
        return jax.random.uniform(
            rng, (self.sys.num_joint_dof,), minval=-0.01, maxval=0.01
        )
