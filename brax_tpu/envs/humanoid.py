"""Humanoid: a bipedal humanoid rewarded for walking in +x.

Two variants, mirroring the reference registry (which maps 'humanoid' to the
fork's humanoid_new):
  - `Humanoid`: /root/reference/brax/envs/humanoid_new.py (healthy z 1.1-2.0,
    scene includes a Target body)
  - `HumanoidLegacy`: /root/reference/brax/envs/humanoid.py (healthy z
    0.8-2.1)
Obs layout parity: humanoid_new.py:249-296 (qpos/qvel + CoM inertia/velocity
blocks + actuator torques).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.envs.assets.humanoid import humanoid_config, humanoid_config_spring
from brax_tpu.envs.assets.humanoid_new import humanoid_new_config
from brax_tpu.sim.types import QP, Info


class HumanoidLegacy(base.Env):
    """The pre-fork humanoid (reference brax/envs/humanoid.py)."""

    def __init__(
        self,
        forward_reward_weight=1.25,
        ctrl_cost_weight=0.1,
        healthy_reward=5.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.8, 2.1),
        reset_noise_scale=1e-2,
        exclude_current_positions_from_observation=True,
        legacy_spring=False,
        **kwargs,
    ):
        config = humanoid_config_spring() if legacy_spring else humanoid_config()
        super().__init__(config=config)
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )

    def reset(self, rng) -> base.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        qpos = self.default_angle() + self._noise(rng1)
        qvel = self._noise(rng2)
        qp = self.default_qp(joint_angle=qpos, joint_velocity=qvel)
        obs = self._get_obs(qp, self.sys.info(qp), jnp.zeros(self.action_size))
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "forward_reward": zero,
            "reward_linvel": zero,
            "reward_quadctrl": zero,
            "reward_alive": zero,
            "x_position": zero,
            "y_position": zero,
            "distance_from_origin": zero,
            "x_velocity": zero,
            "y_velocity": zero,
        }
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)

        com_before = self._center_of_mass(state.qp)
        com_after = self._center_of_mass(qp)
        velocity = (com_after - com_before) / self.art.config.dt
        forward_reward = self._forward_reward_weight * velocity[0]

        min_z, max_z = self._healthy_z_range
        is_healthy = jnp.where(qp.pos[0, 2] < min_z, 0.0, 1.0)
        is_healthy = jnp.where(qp.pos[0, 2] > max_z, 0.0, is_healthy)
        if self._terminate_when_unhealthy:
            healthy_reward = self._healthy_reward
        else:
            healthy_reward = self._healthy_reward * is_healthy

        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))
        obs = self._get_obs(qp, info, action)
        reward = forward_reward + healthy_reward - ctrl_cost
        done = 1.0 - is_healthy if self._terminate_when_unhealthy else 0.0
        state.metrics.update(
            forward_reward=forward_reward,
            reward_linvel=forward_reward,
            reward_quadctrl=-ctrl_cost,
            reward_alive=healthy_reward,
            x_position=com_after[0],
            y_position=com_after[1],
            distance_from_origin=jnp.linalg.norm(com_after),
            x_velocity=velocity[0],
            y_velocity=velocity[1],
        )
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    def _get_obs(self, qp: QP, info: Info, action) -> jnp.ndarray:
        """qpos/qvel + CoM inertia/velocity blocks + actuator torques."""
        joint_angle, joint_vel = self.sys.joint_angle_vel(qp)

        if self._exclude_current_positions_from_observation:
            qpos = [qp.pos[0, 2:], qp.rot[0], joint_angle]
        else:
            qpos = [qp.pos[0], qp.rot[0], joint_angle]
        qvel = [qp.vel[0], qp.ang[0], joint_vel]

        com = self._center_of_mass(qp)
        mass_sum = jnp.sum(self.sys.mass[:-1])
        mass = self.sys.mass
        inertia_diag = 1.0 / self.sys.inv_inertia  # (nb, 3)

        d = qp.pos - com  # (nb, 3)
        d_norm_sq = jnp.sum(d * d, axis=-1)  # (nb,)
        eye = jnp.eye(3)
        com_inr = mass[:, None, None] * eye * d_norm_sq[:, None, None]
        com_inr += jax.vmap(jnp.diag)(inertia_diag) - jax.vmap(jnp.outer)(d, d)
        com_vel = mass[:, None] * qp.vel / mass_sum
        com_ang = jnp.cross(d, qp.vel) / (1e-7 + d_norm_sq[:, None])

        cinert = [com_inr[:-1].ravel()]
        cvel = [com_vel[:-1].ravel(), com_ang[:-1].ravel()]

        qfrc_actuator = []
        for a in self.sys.actuator_groups:
            idx = jnp.asarray(a.act_index.a)
            torque = jnp.take(action, idx, mode="clip")
            torque = torque.reshape(torque.shape[:-2] + (-1,))
            torque = torque * jnp.repeat(a.strength, idx.shape[-1])
            qfrc_actuator.append(torque)

        return jnp.concatenate(qpos + qvel + cinert + cvel + qfrc_actuator)

    def _center_of_mass(self, qp: QP):
        mass, pos = self.sys.mass[:-1], qp.pos[:-1]
        return jnp.sum(mass[:, None] * pos, axis=0) / jnp.sum(mass)

    def _noise(self, rng):
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        return jax.random.uniform(rng, (self.sys.num_joint_dof,), minval=low, maxval=hi)


class Humanoid(HumanoidLegacy):
    """The fork's humanoid_new: Target body in scene, healthy z 1.1-2.0."""

    def __init__(
        self,
        forward_reward_weight=1.25,
        ctrl_cost_weight=0.1,
        healthy_reward=5.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(1.1, 2.0),
        reset_noise_scale=1e-2,
        exclude_current_positions_from_observation=True,
        **kwargs,
    ):
        base.Env.__init__(self, config=humanoid_new_config())
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )
        self.target_radius = 0.1
        self.target_distance = 10
        # NOTE: the reference humanoid_new looks up a 'Target' body here
        # (humanoid_new.py:214) but its _SYSTEM_CONFIG has the Target body
        # commented out (humanoid_new.py:1026), so the reference env itself
        # raises KeyError on construction; the fields are dead code (never
        # used by step/obs).  We keep the working parts only.
        self.target_idx = self.art.body_index.get("Target")
        self.torso_idx = self.art.body_index["torso"]
