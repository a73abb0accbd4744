"""Reacher: a 2-link arm reaching a random target.

Behavior parity: /root/reference/brax/envs/reacher.py (reset 118-140, step
142-155, obs 157-173, random target 175-185).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.reacher import reacher_config, reacher_config_spring
from brax_tpu.sim.types import QP, Info


class Reacher(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        config = reacher_config_spring() if legacy_spring else reacher_config()
        super().__init__(config=config)
        self._target_idx = self.art.body_index["target"]
        self._arm_idx = self.art.body_index["body1"]

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1
        )
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.005, maxval=0.005
        )
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        _, target = self._random_target(rng)
        pos = qp.pos.at[self._target_idx].set(target)
        qp = qp.replace(pos=pos)
        obs = self._get_obs(qp, self.sys.info(qp))
        reward, done, zero = jnp.zeros(3)
        metrics = {"reward_dist": zero, "reward_ctrl": zero}
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        reward_dist = -maths.safe_norm(obs[-3:])
        reward_ctrl = -jnp.square(action).sum()
        reward = reward_dist + reward_ctrl
        state.metrics.update(reward_dist=reward_dist, reward_ctrl=reward_ctrl)
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _get_obs(self, qp: QP, info: Info):
        """Egocentric observation of target and arm body."""
        joint_angle, _ = self.sys.joint_angle_vel(qp)

        qpos = [qp.pos[self._target_idx, :2]]

        arm_qp = qp.take(self._arm_idx)
        tip_pos, tip_vel = arm_qp.to_world(jnp.array([0.11, 0.0, 0.0]))
        tip_to_target = [tip_pos - qp.pos[self._target_idx]]
        cos_sin_angle = [jnp.cos(joint_angle), jnp.sin(joint_angle)]
        qvel = [tip_vel[:2]]
        return jnp.concatenate(cos_sin_angle + qpos + qvel + tip_to_target)

    def _random_target(self, rng):
        """Returns a target location in a random circle slightly above xy plane."""
        rng, rng1, rng2 = jax.random.split(rng, 3)
        dist = 0.2 * jax.random.uniform(rng1)
        ang = jnp.pi * 2.0 * jax.random.uniform(rng2)
        target_x = dist * jnp.cos(ang)
        target_y = dist * jnp.sin(ang)
        target_z = 0.01
        target = jnp.array([target_x, target_y, target_z]).transpose()
        return rng, target
