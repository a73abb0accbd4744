"""Swimmer: a 3-link swimmer in a viscous fluid rewarded for swimming +x.

Behavior parity with the reference env (/root/reference/brax/envs/swimmer.py:
drag model in __init__ 147-170, viscous thruster forces 216-227, step
191-214, obs 229-246).  The fluid is modeled as per-body drag forces fed
through thruster force channels appended to the action vector.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.envs.assets.swimmer import swimmer_config
from brax_tpu.sim.types import QP, Info


class Swimmer(base.Env):

    def __init__(
        self,
        forward_reward_weight=1.0,
        ctrl_cost_weight=1e-4,
        reset_noise_scale=0.1,
        exclude_current_positions_from_observation=True,
        **kwargs,
    ):
        super().__init__(config=swimmer_config())
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )

        viscosity = 0.1
        density = 10.0
        inertia = (0.1727875959474387, 3.5709436495803999, 3.5709436495803999)
        body_mass = 34.557519189487735
        inertia = jnp.array(
            [
                inertia[1] + inertia[2] - inertia[0],
                inertia[0] + inertia[1] - inertia[2],
                inertia[0] + inertia[2] - inertia[1],
            ]
        )
        inertia = jnp.sqrt(inertia / (body_mass * 6))
        self._spherical_drag = -3 * jnp.pi * jnp.mean(inertia) * viscosity
        self._fix_drag = 0.5 * density * jnp.array(
            [inertia[1] * inertia[2], inertia[0] * inertia[2], inertia[0] * inertia[1]]
        )

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "reward_fwd": zero,
            "reward_ctrl": zero,
            "x_position": zero,
            "y_position": zero,
            "distance_from_origin": zero,
            "x_velocity": zero,
            "y_velocity": zero,
            "forward_reward": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        force = self._get_viscous_force(state.qp)
        act = jnp.concatenate([action, force.reshape(-1)], axis=0)
        qp, info = self.sys.step(state.qp, act)

        com_before = self._center_of_mass(state.qp)
        com_after = self._center_of_mass(qp)
        velocity = (com_after - com_before) / self.art.config.dt
        forward_reward = self._forward_reward_weight * velocity[0]
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        obs = self._get_obs(qp, info)
        reward = forward_reward - ctrl_cost
        state.metrics.update(
            reward_fwd=forward_reward,
            reward_ctrl=-ctrl_cost,
            x_position=com_after[0],
            y_position=com_after[1],
            distance_from_origin=jnp.linalg.norm(qp.pos[0]),
            x_velocity=velocity[0],
            y_velocity=velocity[1],
            forward_reward=forward_reward,
        )
        return state.replace(qp=qp, obs=obs, reward=reward)

    @property
    def action_size(self):
        return 2

    def _get_viscous_force(self, qp: QP):
        # drag on the three swimmer segments (all bodies except the ground)
        vel = qp.vel[:-1]
        rot = qp.rot[:-1]
        force = vel * self._spherical_drag
        vel_local = maths.inv_rotate(vel, rot)
        force -= jnp.diag(self._fix_drag * jnp.abs(vel_local) * vel_local)
        force = maths.rotate(force, rot)
        return jnp.clip(force, -5.0, 5.0)

    def _get_obs(self, qp: QP, info: Info):
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)
        ang_z = maths.quat_to_euler(qp.rot[0])[2:3]

        if self._exclude_current_positions_from_observation:
            qpos = [ang_z, joint_angle]
        else:
            qpos = [qp.pos[0, :2], ang_z, joint_angle]
        qvel = [qp.vel[0, :2].ravel(), qp.ang[0, 2:], joint_vel]
        return jnp.concatenate(qpos + qvel)

    def _center_of_mass(self, qp: QP):
        mass, pos = self.sys.mass[:-1], qp.pos[:-1]
        return jnp.sum(mass[:, None] * pos, axis=0) / jnp.sum(mass)

    def _noise(self, rng):
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        return jax.random.uniform(rng, (self.sys.num_joint_dof,), minval=low, maxval=hi)
