"""SAC trainer tests: learns the `fast` env + params round-trip.

Parity: /root/reference/brax/training/agents/sac/train_test.py:28-63.
"""

import pickle

import jax
import pytest

from brax_tpu import envs
from brax_tpu.training.agents.sac import train as sac


def test_sac_learns_fast_env():
    fast = envs._envs["fast"]()
    _, _, metrics = sac.train(
        fast,
        num_timesteps=2**15,
        episode_length=128,
        num_envs=64,
        learning_rate=3e-4,
        discounting=0.99,
        batch_size=64,
        num_evals=3,
        normalize_observations=True,
        reward_scaling=10,
        grad_updates_per_step=64,
        seed=0,
    )
    assert metrics["eval/episode_reward"] > 140 * 0.995


def test_sac_params_roundtrip():
    fast = envs._envs["fast"]()
    make_policy, params, _ = sac.train(
        fast,
        num_timesteps=128,
        episode_length=128,
        num_envs=8,
        batch_size=8,
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
