"""Training entry points for skill discovery and adversarial IRL.

Both algorithms ride the standard PPO trainer through its auxiliary-learner
hooks: the discriminator trains on each collected batch
(`extra_loss_fn`), and batch rewards are relabeled from the discriminator
(`reward_relabel_fn`) before the policy update.  Replaces the reference's
dedicated legacy PPO copy (braxlines/training/ppo.py, 522 LoC).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from brax_tpu import envs
from brax_tpu.braxlines.discriminators import IRLDiscriminator, SkillDiscriminator
from brax_tpu.braxlines.wrappers import SkillWrapper
from brax_tpu.training.agents.ppo import train as ppo


def train_vgcrl(
    environment: envs.Env,
    disc: SkillDiscriminator,
    env_reward_multiplier: float = 0.0,
    seed: int = 0,
    **ppo_kwargs,
):
    """Skill discovery (VGCRL/DIAYN family).

    The policy sees obs ++ z; its reward is log q(z|s) from the
    discriminator, which is simultaneously trained to predict z from visited
    states.  Returns (make_policy, (normalizer, policy, disc_params), metrics).
    """
    env = SkillWrapper(environment, disc)
    obs_size = environment.observation_size

    def extra_loss_fn(disc_params, transitions, rng):
        obs = transitions.observation
        raw_obs, z = obs[..., :obs_size], obs[..., obs_size:]
        return disc.loss(disc_params, raw_obs, z)

    def reward_relabel_fn(disc_params, transitions):
        obs = transitions.next_observation
        raw_obs, z = obs[..., :obs_size], obs[..., obs_size:]
        r = disc.reward(disc_params, raw_obs, z)
        return r + env_reward_multiplier * transitions.reward

    disc_params = disc.init(jax.random.PRNGKey(seed + 1))
    return ppo.train(
        env,
        seed=seed,
        extra_params=disc_params,
        extra_loss_fn=extra_loss_fn,
        reward_relabel_fn=reward_relabel_fn,
        **ppo_kwargs,
    )


def train_irl(
    environment: envs.Env,
    disc: IRLDiscriminator,
    env_reward_multiplier: float = 0.0,
    seed: int = 0,
    **ppo_kwargs,
):
    """Adversarial imitation / state-marginal matching (GAIL/AIRL/FAIRL).

    The discriminator separates `disc.target_data` from on-policy data; the
    policy maximizes the discriminator-derived reward.  Returns
    (make_policy, (normalizer, policy, disc_params), metrics).
    """
    assert disc.target_data is not None, "set disc.target_data first"
    # early discriminator rewards are near-constant; advantage normalization
    # would amplify numerical noise into full-scale updates and can saturate
    # the tanh policy irrecoverably, so it defaults off here
    ppo_kwargs.setdefault("normalize_advantage", False)

    def extra_loss_fn(disc_params, transitions, rng):
        data = disc.obs_act2data(transitions.observation, transitions.action)
        return disc.loss(disc_params, data.reshape(-1, data.shape[-1]), rng)

    def reward_relabel_fn(disc_params, transitions):
        data = disc.obs_act2data(transitions.observation, transitions.action)
        r = disc.reward(disc_params, data)
        return r + env_reward_multiplier * transitions.reward

    disc_params = disc.init(jax.random.PRNGKey(seed + 1))
    return ppo.train(
        environment,
        seed=seed,
        extra_params=disc_params,
        extra_loss_fn=extra_loss_fn,
        reward_relabel_fn=reward_relabel_fn,
        **ppo_kwargs,
    )
