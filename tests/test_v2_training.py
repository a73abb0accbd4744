"""PPO trainer dispatch over v2 (generalized-coordinate) environments."""

import jax
import jax.numpy as jnp


def test_ppo_trains_v2_inverted_pendulum():
    """The shared PPO trainer wraps v2 envs with the v2 wrapper stack and
    completes epochs end-to-end (reference v2/training/agents/ppo)."""
    from brax_tpu.training.agents.ppo import train as ppo
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.get_environment("inverted_pendulum")
    make_policy, params, metrics = ppo.train(
        environment=env,
        num_timesteps=4096,
        episode_length=64,
        num_envs=8,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        discounting=0.97,
        unroll_length=4,
        batch_size=8,
        num_minibatches=4,
        num_updates_per_batch=1,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
    )
    assert "eval/episode_reward" in metrics
    assert jnp.isfinite(metrics["eval/episode_reward"])

    # inference fn runs
    policy = make_policy(params, deterministic=True)
    act, _ = policy(jnp.zeros(env.observation_size), jax.random.PRNGKey(0))
    assert act.shape == (env.action_size,)


def test_sac_trains_v2_inverted_pendulum():
    """Every trainer accepts v2 envs via wrap_for_training_any; SAC's
    on-device replay path end-to-end on the generalized pendulum."""
    from brax_tpu.training.agents.sac import train as sac
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.get_environment("inverted_pendulum")
    make_policy, params, metrics = sac.train(
        environment=env,
        num_timesteps=2048,
        episode_length=64,
        num_envs=8,
        learning_rate=3e-4,
        discounting=0.97,
        batch_size=16,
        min_replay_size=64,
        max_replay_size=1024,
        grad_updates_per_step=1,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
    )
    assert jnp.isfinite(metrics["eval/episode_reward"])
    policy = make_policy(params, deterministic=True)
    act, _ = policy(jnp.zeros(env.observation_size), jax.random.PRNGKey(0))
    assert act.shape == (env.action_size,)


def test_es_trains_v2_inverted_pendulum():
    from brax_tpu.training.agents.es import train as es
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.get_environment("inverted_pendulum")
    _, _, metrics = es.train(
        environment=env,
        num_timesteps=2048,
        episode_length=32,
        population_size=8,
        learning_rate=0.01,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
    )
    assert jnp.isfinite(metrics["eval/episode_reward"])
