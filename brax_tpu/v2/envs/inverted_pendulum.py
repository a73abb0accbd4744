"""Cart-pole balance task on the v2 pipelines (classic inverted pendulum)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class InvertedPendulum(env.PipelineEnv):
    """Balance a pole on a sliding cart; +1 reward per upright step."""

    def __init__(self, backend="generalized", n_frames=2, **kwargs):
        sys = mjcf.loads(assets.inverted_pendulum_xml())
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)

    def reset(self, rng: jnp.ndarray) -> env.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.q_size(),), minval=-0.01, maxval=0.01
        )
        qd = jax.random.uniform(
            rng2, (self.sys.qd_size(),), minval=-0.01, maxval=0.01
        )
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done = jnp.zeros(2)
        return env.State(pipeline_state, obs, reward, done, {})

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        pipeline_state = self.pipeline_step(state.pipeline_state, action)
        obs = self._get_obs(pipeline_state)
        reward = jnp.ones(())
        done = jnp.where(jnp.abs(obs[1]) > 0.2, 1.0, 0.0)
        return state.replace(
            pipeline_state=pipeline_state, obs=obs, reward=reward, done=done
        )

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        return jnp.concatenate([pipeline_state.q, pipeline_state.qd])
