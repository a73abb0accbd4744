"""Halfcheetah planar runner on the v2 pipelines.

Reference parity: brax/v2 ships only ant as a v2 env (v2/envs/__init__.py);
this port follows the classic MuJoCo halfcheetah task semantics (forward
velocity reward minus control cost) on the generalized pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class Halfcheetah(env.PipelineEnv):
    """Planar cheetah running toward +x."""

    def __init__(
        self,
        forward_reward_weight=1.0,
        ctrl_cost_weight=0.1,
        reset_noise_scale=0.1,
        exclude_current_positions_from_observation=True,
        backend="generalized",
        n_frames=5,
        **kwargs,
    ):
        sys = mjcf.loads(assets.halfcheetah_xml())
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)
        self._forward_reward_weight = forward_reward_weight
        self._ctrl_cost_weight = ctrl_cost_weight
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
        qd = hi * jax.random.normal(rng2, (self.sys.qd_size(),))
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done, zero = jnp.zeros(3)
        metrics = {
            "x_position": zero,
            "x_velocity": zero,
            "reward_ctrl": zero,
            "reward_run": zero,
        }
        return env.State(pipeline_state, obs, reward, done, metrics)

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        pipeline_state0 = state.pipeline_state
        pipeline_state = self.pipeline_step(pipeline_state0, action)

        x_velocity = (
            pipeline_state.x.pos[0, 0] - pipeline_state0.x.pos[0, 0]
        ) / self.dt
        forward_reward = self._forward_reward_weight * x_velocity
        ctrl_cost = self._ctrl_cost_weight * jnp.sum(jnp.square(action))

        obs = self._get_obs(pipeline_state)
        reward = forward_reward - ctrl_cost
        state.metrics.update(
            x_position=pipeline_state.x.pos[0, 0],
            x_velocity=x_velocity,
            reward_run=forward_reward,
            reward_ctrl=-ctrl_cost,
        )
        return state.replace(
            pipeline_state=pipeline_state, obs=obs, reward=reward, done=jnp.zeros(())
        )

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        qpos = pipeline_state.q
        if self._exclude_current_positions_from_observation:
            qpos = qpos[1:]
        return jnp.concatenate([qpos, pipeline_state.qd])
