"""ReacherAngle: reacher variant with angle (position-target) actuators.

Behavior parity: /root/reference/brax/envs/reacherangle.py (action rescaling
to joint limits 126-133, reset 135-153, step 155-171, obs 173-189).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.reacherangle import (
    reacherangle_config,
    reacherangle_config_spring,
)
from brax_tpu.sim.types import QP, Info


class ReacherAngle(base.Env):

    def __init__(self, legacy_spring=False, **kwargs):
        config = reacherangle_config_spring() if legacy_spring else reacherangle_config()
        super().__init__(config=config)
        self.target_idx = self.art.body_index["target"]
        self.arm_idx = self.art.body_index["body1"]

        limits = []
        for j in self.art.config.joints:
            for lo, hi in j.angle_limits:
                limits.append((lo, hi))
        self._min_act = jnp.array([l[0] for l in limits])
        self._range_act = jnp.array([l[1] - l[0] for l in limits])

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + jax.random.uniform(
            rng1, (self.sys.num_joint_dof,), minval=-0.1, maxval=0.1
        )
        qvel = jax.random.uniform(
            rng2, (self.sys.num_joint_dof,), minval=-0.005, maxval=0.005
        )
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        rng, target = self._random_target(rng)
        pos = qp.pos.at[self.target_idx].set(target)
        qp = qp.replace(pos=pos)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        metrics = {"rewardDist": zero, "rewardCtrl": zero}
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        action = self._min_act + self._range_act * ((action + 1) / 2.0)
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        reward_dist = -maths.safe_norm(obs[-3:])
        reward = reward_dist
        metrics = {"rewardDist": reward_dist, "rewardCtrl": jnp.zeros(())}
        return state.replace(qp=qp, obs=obs, reward=reward, metrics=metrics)

    def _get_obs(self, qp: QP, info: Info):
        joint_angle, _ = self.sys.joint_angle_vel(qp)

        qpos = [qp.pos[self.target_idx, :2]]
        arm_qp = qp.take(self.arm_idx)
        tip_pos, tip_vel = arm_qp.to_world(jnp.array([0.11, 0.0, 0.0]))
        tip_to_target = [tip_pos - qp.pos[self.target_idx]]
        cos_sin_angle = [jnp.cos(joint_angle), jnp.sin(joint_angle)]
        qvel = [tip_vel[:2]]
        return jnp.concatenate(cos_sin_angle + qpos + qvel + tip_to_target)

    def _random_target(self, rng):
        """Returns a target location in a random circle slightly above xy plane."""
        rng, rng1, rng2 = jax.random.split(rng, 3)
        dist = 0.2 * jnp.sqrt(jax.random.uniform(rng1))
        ang = jnp.pi * 2.0 * jax.random.uniform(rng2)
        target_x = dist * jnp.cos(ang)
        target_y = dist * jnp.sin(ang)
        target_z = 0.01
        target = jnp.array([target_x, target_y, target_z]).transpose()
        return rng, target
