"""Pusher: a robot arm pushing an object to a goal position.

Behavior parity: /root/reference/brax/envs/pusher.py (reset 131-161, step
163-187, obs 189-200).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.pusher import pusher_config
from brax_tpu.sim.types import QP


class Pusher(base.Env):

    def __init__(self, **kwargs):
        super().__init__(config=pusher_config())
        self._object_idx = self.art.body_index["object"]
        self._tips_arm_idx = self.art.body_index["r_wrist_roll_link"]
        self._goal_idx = self.art.body_index["goal"]
        self._table_idx = self.art.body_index["table"]
        self._goal_pos = jnp.array([0.45, 0.05, 0.05])

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)

        cylinder_pos = jnp.concatenate(
            [
                jax.random.uniform(rng, (1,), minval=-0.3, maxval=0),
                jax.random.uniform(rng1, (1,), minval=-0.2, maxval=0.2),
                jnp.ones(1) * 0.0,
            ]
        )
        norm = jnp.linalg.norm(cylinder_pos)
        scale = jnp.where(norm > 0.17, 0.17 / norm, 1.0)
        cylinder_pos = scale * cylinder_pos + jnp.array([0.0, 0.0, 0.05])
        qpos = self.default_angle()

        qvel = jnp.concatenate(
            [
                jax.random.uniform(
                    rng2, (self.sys.num_joint_dof - 4,), minval=-0.005, maxval=0.005
                ),
                jnp.zeros(4),
            ]
        )
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)

        pos = qp.pos.at[self._goal_idx].set(self._goal_pos)
        pos = pos.at[self._object_idx].set(cylinder_pos)
        pos = pos.at[self._table_idx].set(jnp.zeros(3))
        qp = qp.replace(pos=pos)

        obs = self._get_obs(qp)
        reward, done, zero = jnp.zeros(3)
        metrics = {"reward_dist": zero, "reward_ctrl": zero, "reward_near": zero}
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        vec_1 = state.qp.pos[self._object_idx] - state.qp.pos[self._tips_arm_idx]
        vec_2 = state.qp.pos[self._object_idx] - state.qp.pos[self._goal_idx]

        reward_near = -maths.safe_norm(vec_1)
        reward_dist = -maths.safe_norm(vec_2)
        reward_ctrl = -jnp.square(action).sum()

        qp, _ = self.sys.step(state.qp, action)
        obs = self._get_obs(qp)
        reward = reward_dist + 0.1 * reward_ctrl + 0.5 * reward_near
        state.metrics.update(
            reward_near=reward_near,
            reward_dist=reward_dist,
            reward_ctrl=reward_ctrl,
        )
        return state.replace(qp=qp, obs=obs, reward=reward)

    def _get_obs(self, qp: QP):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        return jnp.concatenate(
            [
                joint_angle,
                joint_vel,
                qp.pos[self._tips_arm_idx],
                qp.pos[self._object_idx],
                qp.pos[self._goal_idx],
            ]
        )
