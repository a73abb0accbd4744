"""Ant locomotion task on the v2 pipelines.

Parity with reference brax/v2/envs/ant.py: forward-progress reward, healthy
z-range termination, control cost; obs = q (optionally minus root xy) + qd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class Ant(env.PipelineEnv):
    """Quadruped running toward +x."""

    def __init__(
        self,
        ctrl_cost_weight=0.5,
        use_contact_forces=False,
        contact_cost_weight=5e-4,
        healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.2, 1.0),
        contact_force_range=(-1.0, 1.0),
        reset_noise_scale=0.1,
        exclude_current_positions_from_observation=True,
        backend="generalized",
        n_frames=5,
        **kwargs,
    ):
        sys = mjcf.loads(assets.ant_xml())
        if backend == "spring":
            sys = self._spring_sys(sys)
            n_frames = 10
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)

        self._ctrl_cost_weight = ctrl_cost_weight
        self._contact_cost_weight = contact_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._contact_force_range = contact_force_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )
        if use_contact_forces:
            raise NotImplementedError("use_contact_forces not implemented")

    def reset(self, rng: jnp.ndarray) -> env.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.q_size(),), minval=low, maxval=hi
        )
        qd = hi * jax.random.normal(rng2, (self.sys.qd_size(),))
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "reward_forward": zero,
            "reward_survive": zero,
            "reward_ctrl": zero,
            "reward_contact": zero,
            "x_position": zero,
            "y_position": zero,
            "distance_from_origin": zero,
            "x_velocity": zero,
            "y_velocity": zero,
            "forward_reward": zero,
        }
        return env.State(pipeline_state, obs, reward, done, metrics)

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        pipeline_state0 = state.pipeline_state
        pipeline_state = self.pipeline_step(pipeline_state0, action)

        velocity = (pipeline_state.x.pos[0] - pipeline_state0.x.pos[0]) / self.dt
        forward_reward = velocity[0]

        min_z, max_z = self._healthy_z_range
        is_healthy = jnp.where(pipeline_state.x.pos[0, 2] < min_z, 0.0, 1.0)
        is_healthy = jnp.where(pipeline_state.x.pos[0, 2] > max_z, 0.0, is_healthy)
        if self._terminate_when_unhealthy:
            healthy_reward = self._healthy_reward
        else:
            healthy_reward = self._healthy_reward * is_healthy
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        obs = self._get_obs(pipeline_state)
        reward = forward_reward + healthy_reward - ctrl_cost
        done = 1.0 - is_healthy if self._terminate_when_unhealthy else 0.0
        state.metrics.update(
            reward_forward=forward_reward,
            reward_survive=healthy_reward,
            reward_ctrl=-ctrl_cost,
            reward_contact=jnp.zeros(()),
            x_position=pipeline_state.x.pos[0, 0],
            y_position=pipeline_state.x.pos[0, 1],
            distance_from_origin=maths.safe_norm(pipeline_state.x.pos[0]),
            x_velocity=velocity[0],
            y_velocity=velocity[1],
            forward_reward=forward_reward,
        )
        return state.replace(
            pipeline_state=pipeline_state, obs=obs, reward=reward, done=done
        )

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        qpos = pipeline_state.q
        qvel = pipeline_state.qd
        if self._exclude_current_positions_from_observation:
            qpos = pipeline_state.q[2:]
        return jnp.concatenate([qpos, qvel])

    @staticmethod
    def _spring_sys(sys):
        """Spring-backend stability overrides (reference ant.py:290-308)."""
        n = sys.num_links()
        sys = sys.replace(
            link=sys.link.replace(
                inertia=sys.link.inertia.replace(
                    i=jnp.stack([jnp.eye(3)] * n),
                    mass=jnp.ones_like(sys.link.inertia.mass),
                ),
                constraint_limit_stiffness=jnp.full(n, 1000.0),
                constraint_stiffness=jnp.full(n, 4000.0),
                constraint_ang_damping=jnp.full(n, 10.0),
                constraint_damping=jnp.full(n, 20.0),
            ),
            ang_damping=jnp.zeros(()),
            dt=jnp.asarray(0.005),
            actuator=sys.actuator.replace(gear=jnp.full(8, 100.0)),
        )
        return sys
