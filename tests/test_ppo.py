"""PPO trainer tests: learns the `fast` env + params round-trip.

Parity: /root/reference/brax/training/agents/ppo/train_test.py:31-68.
"""

import pickle

import jax
import pytest

from brax_tpu import envs
from brax_tpu.training.agents.ppo import networks as ppo_networks
from brax_tpu.training.agents.ppo import train as ppo


def test_ppo_learns_fast_env():
    fast = envs._envs["fast"]()
    _, _, metrics = ppo.train(
        fast,
        num_timesteps=2**15,
        episode_length=128,
        num_envs=64,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        discounting=0.95,
        unroll_length=5,
        batch_size=64,
        num_minibatches=8,
        num_updates_per_batch=4,
        num_evals=3,
        reward_scaling=10.0,
        normalize_observations=True,
        seed=2,
    )
    assert metrics["eval/episode_reward"] > 135


def test_ppo_params_roundtrip():
    fast = envs._envs["fast"]()
    make_policy, params, _ = ppo.train(
        fast,
        num_timesteps=128,
        episode_length=128,
        num_envs=8,
        unroll_length=4,
        batch_size=8,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=1,
        normalize_observations=True,
    )
    blob = pickle.dumps(params)
    params2 = pickle.loads(blob)
    policy = make_policy(params2, deterministic=True)
    rng = jax.random.PRNGKey(0)
    obs = jax.numpy.zeros((2,))
    act1, _ = make_policy(params, deterministic=True)(obs, rng)
    act2, _ = policy(obs, rng)
    assert jax.numpy.allclose(act1, act2)
