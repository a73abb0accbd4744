"""Env wrappers for the v2 pipeline envs.

Parity with reference brax/v2/envs/wrapper.py: Episode (step/truncation
bookkeeping + action_repeat), Vmap (env batch axis), AutoReset (restore the
post-reset pipeline state where done), Eval (episode metric aggregation).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu.v2.envs import env as v2_env


def wrap_for_training(
    env: v2_env.Env, episode_length: int = 1000, action_repeat: int = 1
) -> v2_env.Wrapper:
    """Episode -> Vmap -> AutoReset, the standard trainer stack."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    env = VmapWrapper(env)
    env = AutoResetWrapper(env)
    return env


class VmapWrapper(v2_env.Wrapper):
    """Vectorizes reset/step over a leading batch axis."""

    def __init__(self, env: v2_env.Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng: jnp.ndarray) -> v2_env.State:
        if self.batch_size is not None:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: v2_env.State, action: jnp.ndarray) -> v2_env.State:
        return jax.vmap(self.env.step)(state, action)


class EpisodeWrapper(v2_env.Wrapper):
    """Counts steps, truncates at episode_length, repeats actions."""

    def __init__(self, env: v2_env.Env, episode_length: int, action_repeat: int):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng: jnp.ndarray) -> v2_env.State:
        state = self.env.reset(rng)
        state.info["steps"] = jnp.zeros(rng.shape[:-1])
        state.info["truncation"] = jnp.zeros(rng.shape[:-1])
        return state

    def step(self, state: v2_env.State, action: jnp.ndarray) -> v2_env.State:
        def f(state, _):
            nstate = self.env.step(state, action)
            return nstate, nstate.reward

        state, rewards = jax.lax.scan(f, state, (), self.action_repeat)
        state = state.replace(reward=jnp.sum(rewards, axis=0))
        steps = state.info["steps"] + self.action_repeat
        one = jnp.ones_like(state.done)
        zero = jnp.zeros_like(state.done)
        episode_length = jnp.array(self.episode_length, dtype=jnp.int32)
        done = jnp.where(steps >= episode_length, one, state.done)
        state.info["truncation"] = jnp.where(
            steps >= episode_length, 1 - state.done, zero
        )
        state.info["steps"] = steps
        return state.replace(done=done)


class AutoResetWrapper(v2_env.Wrapper):
    """Restores the post-reset state wherever an episode finished."""

    def reset(self, rng: jnp.ndarray) -> v2_env.State:
        state = self.env.reset(rng)
        state.info["first_pipeline_state"] = state.pipeline_state
        state.info["first_obs"] = state.obs
        return state

    def step(self, state: v2_env.State, action: jnp.ndarray) -> v2_env.State:
        if "steps" in state.info:
            steps = state.info["steps"]
            steps = jnp.where(state.done, jnp.zeros_like(steps), steps)
            state.info.update(steps=steps)
        state = state.replace(done=jnp.zeros_like(state.done))
        state = self.env.step(state, action)

        def where_done(x, y):
            done = state.done
            if done.shape:
                done = jnp.reshape(done, [x.shape[0]] + [1] * (len(x.shape) - 1))
            return jnp.where(done, x, y)

        pipeline_state = jax.tree_util.tree_map(
            where_done, state.info["first_pipeline_state"], state.pipeline_state
        )
        obs = where_done(state.info["first_obs"], state.obs)
        return state.replace(pipeline_state=pipeline_state, obs=obs)


@struct.dataclass
class EvalMetrics:
    """Aggregated episode metrics for evaluation runs."""

    episode_metrics: Dict[str, jnp.ndarray]
    active_episodes: jnp.ndarray
    episode_steps: jnp.ndarray


class EvalWrapper(v2_env.Wrapper):
    """Accumulates per-episode metrics until each episode finishes."""

    def reset(self, rng: jnp.ndarray) -> v2_env.State:
        reset_state = self.env.reset(rng)
        reset_state.metrics["reward"] = reset_state.reward
        eval_metrics = EvalMetrics(
            episode_metrics=jax.tree_util.tree_map(
                jnp.zeros_like, reset_state.metrics
            ),
            active_episodes=jnp.ones_like(reset_state.reward),
            episode_steps=jnp.zeros_like(reset_state.reward),
        )
        reset_state.info["eval_metrics"] = eval_metrics
        return reset_state

    def step(self, state: v2_env.State, action: jnp.ndarray) -> v2_env.State:
        state_metrics = state.info["eval_metrics"]
        if not isinstance(state_metrics, EvalMetrics):
            raise ValueError(f"Incorrect type for state_metrics: {type(state_metrics)}")
        del state.info["eval_metrics"]
        nstate = self.env.step(state, action)
        nstate.metrics["reward"] = nstate.reward
        episode_steps = jnp.where(
            state_metrics.active_episodes,
            nstate.info["steps"],
            state_metrics.episode_steps,
        )
        episode_metrics = jax.tree_util.tree_map(
            lambda a, b: a + b * state_metrics.active_episodes,
            state_metrics.episode_metrics,
            nstate.metrics,
        )
        active_episodes = state_metrics.active_episodes * (1 - nstate.done)
        nstate.info["eval_metrics"] = EvalMetrics(
            episode_metrics=episode_metrics,
            active_episodes=active_episodes,
            episode_steps=episode_steps,
        )
        return nstate
