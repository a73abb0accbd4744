"""Walker2d planar biped on the v2 pipelines.

Reference parity: brax/v2 ships only ant as a v2 env (v2/envs/__init__.py);
this port follows the classic MuJoCo walker2d task semantics on the
generalized pipeline (forward reward + healthy bonus - control cost).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class Walker2d(env.PipelineEnv):
    """Planar two-legged walker driving toward +x."""

    def __init__(
        self,
        forward_reward_weight=1.0,
        ctrl_cost_weight=1e-3,
        healthy_reward=1.0,
        terminate_when_unhealthy=True,
        healthy_z_range=(0.8, 2.0),
        healthy_angle_range=(-1.0, 1.0),
        reset_noise_scale=5e-3,
        exclude_current_positions_from_observation=True,
        backend="generalized",
        n_frames=4,
        **kwargs,
    ):
        sys = mjcf.loads(assets.walker2d_xml())
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
        self._healthy_reward = healthy_reward
        self._terminate_when_unhealthy = terminate_when_unhealthy
        self._healthy_z_range = healthy_z_range
        self._healthy_angle_range = healthy_angle_range
        self._reset_noise_scale = reset_noise_scale
        self._exclude_current_positions_from_observation = (
            exclude_current_positions_from_observation
        )

    def reset(self, rng: jnp.ndarray) -> env.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        low, hi = -self._reset_noise_scale, self._reset_noise_scale
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.q_size(),), minval=low, maxval=hi
        )
        qd = jax.random.uniform(rng2, (self.sys.qd_size(),), minval=low, maxval=hi)
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "x_position": zero,
            "x_velocity": zero,
            "reward_forward": zero,
            "reward_ctrl": zero,
            "reward_healthy": zero,
        }
        return env.State(pipeline_state, obs, reward, done, metrics)

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        ps0 = state.pipeline_state
        ps = self.pipeline_step(ps0, action)

        x_velocity = (ps.x.pos[0, 0] - ps0.x.pos[0, 0]) / self.dt
        forward_reward = self._forward_reward_weight * x_velocity
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        z = ps.x.pos[0, 2]
        angle = ps.q[2]
        min_z, max_z = self._healthy_z_range
        min_a, max_a = self._healthy_angle_range
        is_healthy = (
            (z > min_z) & (z < max_z) & (angle > min_a) & (angle < max_a)
        ).astype(jnp.float32)
        healthy_reward = self._healthy_reward * (
            is_healthy if not self._terminate_when_unhealthy else 1.0
        )

        obs = self._get_obs(ps)
        reward = forward_reward + healthy_reward - ctrl_cost
        done = (
            1.0 - is_healthy if self._terminate_when_unhealthy else jnp.zeros(())
        )
        state.metrics.update(
            x_position=ps.x.pos[0, 0],
            x_velocity=x_velocity,
            reward_forward=forward_reward,
            reward_ctrl=-ctrl_cost,
            reward_healthy=jnp.asarray(healthy_reward, jnp.float32),
        )
        return state.replace(pipeline_state=ps, obs=obs, reward=reward, done=done)

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        qpos = pipeline_state.q
        if self._exclude_current_positions_from_observation:
            qpos = qpos[1:]
        return jnp.concatenate([qpos, jnp.clip(pipeline_state.qd, -10.0, 10.0)])
