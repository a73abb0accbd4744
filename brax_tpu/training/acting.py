"""Rollout generation and evaluation.

Parity: /root/reference/brax/training/acting.py:30-139.
"""

from __future__ import annotations

import time
from typing import Callable, Sequence, Tuple

import jax
import numpy as np

from brax_tpu import envs
from brax_tpu.envs import wrappers
from brax_tpu.training.types import Metrics, Policy, PolicyParams, PRNGKey, Transition


def actor_step(
    env: envs.Env,
    env_state: envs.State,
    policy: Policy,
    key: PRNGKey,
    extra_fields: Sequence[str] = (),
) -> Tuple[envs.State, Transition]:
    """One policy step + env step, emitting a Transition."""
    actions, policy_extras = policy(env_state.obs, key)
    nstate = env.step(env_state, actions)
    state_extras = {x: nstate.info[x] for x in extra_fields}
    return nstate, Transition(
        observation=env_state.obs,
        action=actions,
        reward=nstate.reward,
        discount=1 - nstate.done,
        next_observation=nstate.obs,
        extras={"policy_extras": policy_extras, "state_extras": state_extras},
    )


def generate_unroll(
    env: envs.Env,
    env_state: envs.State,
    policy: Policy,
    key: PRNGKey,
    unroll_length: int,
    extra_fields: Sequence[str] = (),
) -> Tuple[envs.State, Transition]:
    """Collects a trajectory of given unroll_length via lax.scan."""

    def f(carry, unused_t):
        state, current_key = carry
        current_key, next_key = jax.random.split(current_key)
        nstate, transition = actor_step(
            env, state, policy, current_key, extra_fields=extra_fields
        )
        return (nstate, next_key), transition

    (final_state, _), data = jax.lax.scan(f, (env_state, key), (), length=unroll_length)
    return final_state, data


class Evaluator:
    """Runs policy evaluation episodes and aggregates metrics."""

    def __init__(self, eval_env: envs.Env,
                 eval_policy_fn: Callable[[PolicyParams], Policy],
                 num_eval_envs: int, episode_length: int, action_repeat: int,
                 key: PRNGKey, aot_key: str | None = None):
        self._key = key
        self._eval_walltime = 0.0
        # AOT cache id: when set, the eval unroll loads from the on-disk
        # StableHLO cache instead of re-tracing (brax_tpu.aot) — tracing the
        # 1000-step fused-kernel unroll is a minutes-scale cold-start cost
        self._aot_key = aot_key
        self._unroll_fn = None

        from brax_tpu.v2.envs import env as v2_env_mod
        from brax_tpu.v2.envs import wrappers as v2_wrappers

        if isinstance(eval_env, v2_env_mod.Env):
            eval_env = v2_wrappers.EvalWrapper(eval_env)
        else:
            eval_env = wrappers.EvalWrapper(eval_env)

        def generate_eval_unroll(policy_params: PolicyParams, key: PRNGKey) -> envs.State:
            reset_keys = jax.random.split(key, num_eval_envs)
            eval_first_state = eval_env.reset(reset_keys)
            return generate_unroll(
                eval_env,
                eval_first_state,
                eval_policy_fn(policy_params),
                key,
                unroll_length=episode_length // action_repeat,
            )[0]

        self._generate_eval_unroll_raw = generate_eval_unroll
        self._steps_per_unroll = episode_length * num_eval_envs

    def _unroll(self, policy_params: PolicyParams, key: PRNGKey):
        if self._unroll_fn is None:
            if self._aot_key:
                from brax_tpu import aot

                self._unroll_fn, _ = aot.cached_call(
                    self._generate_eval_unroll_raw,
                    f"eval_unroll_{self._aot_key}",
                    (policy_params, key),
                )
            else:
                self._unroll_fn = jax.jit(self._generate_eval_unroll_raw)
        return self._unroll_fn(policy_params, key)

    def run_evaluation(self, policy_params: PolicyParams,
                       training_metrics: Metrics,
                       aggregate_episodes: bool = True) -> Metrics:
        """Runs one evaluation epoch and returns eval/ metrics."""
        self._key, unroll_key = jax.random.split(self._key)

        t = time.time()
        eval_state = self._unroll(policy_params, unroll_key)
        eval_metrics = eval_state.info["eval_metrics"]
        eval_metrics.active_episodes.block_until_ready()
        epoch_eval_time = time.time() - t
        metrics = {
            f"eval/episode_{name}": np.mean(value) if aggregate_episodes else value
            for name, value in eval_metrics.episode_metrics.items()
        }
        metrics["eval/avg_episode_length"] = np.mean(eval_metrics.episode_steps)
        metrics["eval/epoch_eval_time"] = epoch_eval_time
        metrics["eval/sps"] = self._steps_per_unroll / epoch_eval_time
        self._eval_walltime = self._eval_walltime + epoch_eval_time
        metrics = {"eval/walltime": self._eval_walltime, **training_metrics, **metrics}
        return metrics
