"""Composer: scene composition, multi-agent grouping, sharded batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu import composer


def _two_ant_chase(batch_size=None, episode_length=50):
    return composer.create(
        components=dict(
            agent1=dict(
                component="ant",
                pos=(0.0, 2.0, 0.0),
                reward_fns=dict(fwd=dict(reward_type="forward_velocity")),
            ),
            agent2=dict(component="ant", pos=(0.0, -2.0, 0.0)),
        ),
        edges={
            "agent1__agent2": dict(
                collide_type="root",
                reward_fns=dict(chase=dict(reward_type="chase")),
            )
        },
        agent_groups=dict(
            agent1=dict(
                action_agents=("agent1",),
                reward_names=("chase__agent1__agent2", "fwd__agent1"),
            ),
            agent2=dict(
                action_agents=("agent2",),
                reward_names=("chase__agent1__agent2",),
            ),
        ),
        episode_length=episode_length,
        batch_size=batch_size,
        auto_reset=True,
    )


def test_two_ant_multiagent():
    env = _two_ant_chase(batch_size=4)
    assert env.is_multiagent
    assert env.agent_names == ("agent1", "agent2")
    assert env.action_size == 16
    assert env.group_action_shapes["agent1"]["size"] == 8

    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 4))
    assert state.reward.shape == (4, 2)  # per-agent reward vector
    step = jax.jit(env.step)
    for i in range(3):
        act = jax.random.uniform(
            jax.random.PRNGKey(i), (4, 16), minval=-1, maxval=1
        )
        state = step(state, act)
    assert bool(jnp.all(jnp.isfinite(state.obs)))

    # the two ants are distinct bodies placed apart
    m = env.unwrapped.component_meta
    sep = jnp.linalg.norm(
        state.qp.pos[0, m["agent1"]["root_idx"]]
        - state.qp.pos[0, m["agent2"]["root_idx"]]
    )
    assert float(sep) > 1.0


def test_single_agent_scene_scalar_reward():
    env = composer.create(
        components=dict(
            ant1=dict(
                component="ant",
                reward_fns=dict(
                    fwd=dict(reward_type="forward_velocity"),
                    ctrl=dict(reward_type="ctrl_cost", weight=0.1),
                ),
            ),
            ball=dict(component="ball", pos=(2.0, 0.0, 1.0)),
        ),
        episode_length=20,
        batch_size=None,
        auto_reset=False,
    )
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert s.reward.shape == ()
    s = jax.jit(env.step)(s, jnp.zeros(env.action_size))
    assert bool(jnp.isfinite(s.reward))
    assert "reward_fwd__ant1" in s.metrics


def test_composed_scene_shards_over_mesh():
    """BASELINE config 5 shape: a multi-agent composed scene sharded over the
    (virtual) device mesh."""
    from jax.sharding import PartitionSpec as P

    from brax_tpu.training import mesh_utils

    mesh = mesh_utils.create_mesh()
    n = 2 * mesh.size
    env = _two_ant_chase(batch_size=n, episode_length=10)

    reset_fn = jax.jit(env.reset, out_shardings=mesh_utils.env_sharded(mesh))
    state = reset_fn(
        mesh_utils.put_env_sharded(jax.random.split(jax.random.PRNGKey(0), n), mesh)
    )

    def rollout(state):
        def body(s, _):
            return env.step(s, jnp.zeros((s.obs.shape[0], 16))), ()
        return jax.lax.scan(body, state, (), length=5)[0]

    rollout_sharded = jax.jit(
        mesh_utils.shard_map(
            rollout, mesh, in_specs=(P(mesh_utils.AXIS),), out_specs=P(mesh_utils.AXIS)
        )
    )
    out = rollout_sharded(state)
    assert bool(jnp.all(jnp.isfinite(out.obs)))
    assert out.obs.shape[0] == n


def test_mappo_trains_two_ant_chase():
    from brax_tpu.composer.training import mappo

    env = _two_ant_chase(batch_size=None, episode_length=None)
    make_policy, params, metrics = mappo.train(
        env.unwrapped,
        num_timesteps=2048,
        episode_length=32,
        num_envs=16,
        num_eval_envs=8,
        unroll_length=4,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        normalize_observations=True,
    )
    assert "eval/episode_reward" in metrics
    # joint policy emits the full action vector
    policy = make_policy(params, deterministic=True)
    obs = jnp.zeros((env.unwrapped.observation_size,))
    act, _ = policy(obs, jax.random.PRNGKey(0))
    assert act.shape == (16,)


def test_mappo_learns_pointmass_follow():
    """MAPPO actually learns: the follower closes on the moving leader.

    Untrained policies score ~915 on the dist reward (measured); a trained
    follower reaches ~1240 of the 1344 max."""
    from brax_tpu.composer import envs as cenvs
    from brax_tpu.composer.training import mappo

    env = cenvs.create_ma_env(
        task="follow",
        main_agent="pointmass",
        other_agent="pointmass",
        num_agents=2,
        episode_length=None,
        batch_size=None,
        auto_reset=False,
    )
    _, _, metrics = mappo.train(
        env.unwrapped,
        num_timesteps=65536,
        episode_length=64,
        num_envs=32,
        num_eval_envs=16,
        unroll_length=8,
        batch_size=32,
        num_minibatches=4,
        num_updates_per_batch=2,
        num_evals=2,
        normalize_observations=True,
        learning_rate=1e-3,
    )
    assert float(metrics["eval/episode_reward_dist__agent0__agent1"]) > 1100


def test_ma_descs_build_and_step():
    """N-agent chase and sumo descs build, step, and expose per-agent groups."""
    from brax_tpu.composer import envs as cenvs

    env = cenvs.create_ma_env(
        task="chase",
        main_agent="pointmass",
        other_agent="pointmass",
        num_agents=3,
        episode_length=20,
        batch_size=2,
    )
    assert env.unwrapped.agent_names == ("agent0", "agent1", "agent2")
    s = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
    assert s.reward.shape == (2, 3)
    s = jax.jit(env.step)(s, jnp.zeros((2, env.action_size)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))

    env = cenvs.create_ma_env(
        task="sumo",
        main_agent="pointmass",
        other_agent="pointmass",
        num_agents=2,
        episode_length=10,
        batch_size=2,
    )
    # 2 agents + ground + 20 frozen non-colliding ring segments
    assert len(env.unwrapped.component_meta) == 23
    s = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
    s = jax.jit(env.step)(s, jnp.zeros((2, env.action_size)))
    assert bool(jnp.all(jnp.isfinite(s.obs)))


def test_octopus_and_pro_ant_components():
    """Many-body components build and produce finite dynamics."""
    for comp, expected_act in (("octopus", 26), ("pro_ant", 10)):
        env = composer.create(
            components={
                comp: dict(
                    component=comp,
                    component_params=dict(num_legs=5) if comp == "pro_ant" else {},
                    reward_fns=dict(fwd=dict(reward_type="forward_velocity")),
                )
            },
            episode_length=10,
            batch_size=2,
        )
        assert env.action_size == expected_act
        s = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), 2))
        step = jax.jit(env.step)
        for _ in range(3):
            s = step(s, 0.1 * jnp.ones((2, env.action_size)))
        assert bool(jnp.all(jnp.isfinite(s.obs))), comp


def test_sa_descs_build_and_step():
    """Single-agent task descs (parity: reference composer/envs/sa_descs.py)
    + dotted-path desc_edits (the sweep mechanism)."""
    from brax_tpu.composer import envs as cenvs

    for task in ["ant_run", "ant_push", "pro_ant_run"]:
        env = cenvs.create_env(task, episode_length=16, auto_reset=False)
        s = jax.jit(env.reset)(jax.random.PRNGKey(0))
        s = jax.jit(env.step)(s, jnp.zeros((env.action_size,)))
        assert bool(jnp.isfinite(jnp.sum(s.reward))), task

    edited = cenvs.create_env(
        "ant_push",
        desc_edits={"components.cap1.reward_fns.goal.scale": 0.2},
        episode_length=16,
        auto_reset=False,
    )
    s = jax.jit(edited.reset)(jax.random.PRNGKey(0))
    assert s.obs.shape == (edited.observation_size,)


def test_term_params_z_offset():
    """ant_on_ball terminates relative to its elevated start (term_params
    z_offset shifts the component's height bounds)."""
    from brax_tpu.composer import envs as cenvs

    env = cenvs.create_env("ant_on_ball", episode_length=16, auto_reset=False)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    # starts ~6m up on the ball but NOT terminated (bounds are shifted)
    assert float(s.done) == 0.0
