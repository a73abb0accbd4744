"""Environment wrappers: episode bookkeeping, vmap batching, auto-reset, eval.

Parity: /root/reference/brax/envs/wrappers.py:31-202.  (Gym / dm_env adapters
live in brax_tpu/envs/gym_wrappers.py.)
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu.envs import base


def wrap_for_training(env: base.Env, episode_length: int = 1000,
                      action_repeat: int = 1) -> base.Wrapper:
    """Episode -> Vmap -> AutoReset wrapper stack (wrappers.py:31-55)."""
    env = EpisodeWrapper(env, episode_length, action_repeat)
    env = VmapWrapper(env)
    env = AutoResetWrapper(env)
    return env


def wrap_for_training_any(env, episode_length: int = 1000,
                          action_repeat: int = 1):
    """v1/v2 dispatch: v2 (generalized-coordinate) envs get the v2 wrapper
    stack, everything else the v1 stack.  Lets every trainer accept both
    engine generations (parity: reference v2/training/agents share the v1
    trainers the same way)."""
    from brax_tpu.v2.envs import env as v2_env_mod

    if isinstance(env, v2_env_mod.Env):
        from brax_tpu.v2.envs import wrappers as v2_wrappers

        return v2_wrappers.wrap_for_training(
            env, episode_length=episode_length, action_repeat=action_repeat
        )
    return wrap_for_training(
        env, episode_length=episode_length, action_repeat=action_repeat
    )


class VmapWrapper(base.Wrapper):
    """Vectorizes the env over a leading batch axis."""

    def __init__(self, env: base.Env, batch_size: Optional[int] = None):
        super().__init__(env)
        self.batch_size = batch_size

    def reset(self, rng) -> base.State:
        if self.batch_size is not None and rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(self.env.reset)(rng)

    def step(self, state: base.State, action) -> base.State:
        return jax.vmap(self.env.step)(state, action)


class EpisodeWrapper(base.Wrapper):
    """Maintains episode step count and sets done at episode end."""

    def __init__(self, env: base.Env, episode_length: int, action_repeat: int):
        super().__init__(env)
        self.episode_length = episode_length
        self.action_repeat = action_repeat

    def reset(self, rng) -> base.State:
        state = self.env.reset(rng)
        state.info["steps"] = jnp.zeros(rng.shape[:-1])
        state.info["truncation"] = jnp.zeros(rng.shape[:-1])
        return state

    def step(self, state: base.State, action) -> base.State:
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


class AutoResetWrapper(base.Wrapper):
    """Resets envs that are done back to their initial state."""

    def reset(self, rng) -> base.State:
        state = self.env.reset(rng)
        state.info["first_qp"] = state.qp
        state.info["first_obs"] = state.obs
        return state

    def step(self, state: base.State, action) -> base.State:
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

        qp = jax.tree_util.tree_map(where_done, state.info["first_qp"], state.qp)
        obs = where_done(state.info["first_obs"], state.obs)
        return state.replace(qp=qp, obs=obs)


@struct.dataclass
class EvalMetrics:
    """Aggregated per-episode evaluation metrics."""

    episode_metrics: Dict[str, jnp.ndarray]
    active_episodes: jnp.ndarray
    episode_steps: jnp.ndarray


class EvalWrapper(base.Wrapper):
    """Tracks episode-aggregated metrics for evaluation runs."""

    def reset(self, rng) -> base.State:
        reset_state = self.env.reset(rng)
        reset_state.metrics["reward"] = reset_state.reward
        # keyed on done (scalar per env) so vector rewards (multi-agent
        # composer envs) aggregate correctly
        eval_metrics = EvalMetrics(
            episode_metrics=jax.tree_util.tree_map(jnp.zeros_like, reset_state.metrics),
            active_episodes=jnp.ones_like(reset_state.done),
            episode_steps=jnp.zeros_like(reset_state.done),
        )
        reset_state.info["eval_metrics"] = eval_metrics
        return reset_state

    def step(self, state: base.State, action) -> base.State:
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
        def accumulate(a, b):
            active = state_metrics.active_episodes
            active = active.reshape(active.shape + (1,) * (b.ndim - active.ndim))
            return a + b * active

        episode_metrics = jax.tree_util.tree_map(
            accumulate, state_metrics.episode_metrics, nstate.metrics
        )
        active_episodes = state_metrics.active_episodes * (1 - nstate.done)
        nstate.info["eval_metrics"] = EvalMetrics(
            episode_metrics=episode_metrics,
            active_episodes=active_episodes,
            episode_steps=episode_steps,
        )
        return nstate
