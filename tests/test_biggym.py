"""BIG-Gym registry + task tracks."""

import jax
import jax.numpy as jnp

from brax_tpu import biggym
from brax_tpu.composer import components as cc


def test_register_component_creates_task_envs():
    def pogo():
        from brax_tpu.envs.assets.hopper import hopper_config

        c = cc._strip_ground(hopper_config())
        return cc.ComponentSpecs(
            config=c, root="torso", collides=("torso", "foot"),
            observers=("root_z_joints",),
        )

    created = biggym.register("pogo_t", component_fn=pogo)
    assert set(created) == {"race_pogo_t", "chase_pogo_t", "sumo_pogo_t"}
    assert biggym.exists("race_pogo_t")

    env = biggym.create("race_pogo_t", episode_length=16, auto_reset=False)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.zeros(env.action_size))
    assert bool(jnp.isfinite(s.reward))

    ma = biggym.create("sumo_pogo_t", episode_length=16, auto_reset=False)
    s = jax.jit(ma.reset)(jax.random.PRNGKey(0))
    assert s.reward.shape == (2,)


def test_register_env_track():
    from brax_tpu.envs.fast import Fast

    biggym.register("myfast", env_fn=Fast)
    assert "myfast" in biggym.ENVS_BY_TRACKS["open_ended"]
    env = biggym.create("myfast")
    s = env.reset(jax.random.PRNGKey(0))
    assert s.obs.shape == (2,)


def test_register_module_submission_format():
    """Directory-registry submissions: metadata validation, env + component
    registration, mimax obs-indices hookup (parity: reference
    biggym/__init__.py:120-220 + registry/{jump,proant})."""
    env_names, comp_names, task_envs, meta = biggym.register_module("jump")
    assert env_names == ["jump_cheetah"]
    assert meta["AUTHORS"]
    # idempotent
    assert biggym.register_module("jump")[0] == ["jump_cheetah"]

    env = biggym.create("jump_cheetah")
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    s = jax.jit(env.step)(s, jnp.zeros(env.action_size))
    assert bool(jnp.isfinite(s.reward))
    # mimax track registered the obs indices
    from brax_tpu.braxlines import obs_indices as oi

    idx, scale = oi.get_indices("jump_cheetah", "vel")
    assert idx == (10,) and scale == 5.0

    _, comp_names, task_envs, _ = biggym.register_module("proant")
    assert comp_names == ["proant_ant"]
    assert "race_proant_ant" in task_envs
    env = biggym.create("race_proant_ant", episode_length=16, auto_reset=False)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(s.obs)))


def test_inspect_and_assert_env_params():
    supported, kwargs_ok = biggym.inspect_env("ant")
    assert "use_contact_forces" in supported
    biggym.assert_env_params("ant", {"use_contact_forces": True})
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        biggym.assert_env_params("ant", {"no_such_param": 1}, ignore_kwargs=False)


def test_submission_format_rejects_bad_metadata():
    import pytest as _pytest

    with _pytest.raises(AssertionError):
        biggym._validate_metadata(object(), "x")


def test_register_all_and_match_making():
    """Directory registry round-trip + pairwise match-making (parity:
    reference biggym register_all/register_match(es),
    registry/__init__.py REGISTRIES)."""
    import jax
    import jax.numpy as jnp

    from brax_tpu.biggym import registry as registry_pkg
    from brax_tpu.biggym import tasks

    assert registry_pkg.REGISTRIES == sorted(registry_pkg.REGISTRIES)
    out = biggym.register_all()
    assert set(out) == set(registry_pkg.REGISTRIES)
    # the ant submission entered the match pools declared in its tracks
    assert "ant_ant" in biggym.COMPONENTS_BY_TRACKS["race"]
    assert "ant_ant" in biggym.COMPONENTS_BY_TRACKS["sumo"]

    matches = biggym.register_matches()
    # symmetric tracks: one env per unordered pair; asymmetric: per ordered
    pools = {t: biggym.COMPONENTS_BY_TRACKS[biggym._match_pool_track(t)]
             for t in tasks.SYMMETRIC_MA_TASKS + tasks.ASYMMETRIC_MA_TASKS}
    n_sym = sum(len(pools[t]) * (len(pools[t]) - 1) // 2
                for t in tasks.SYMMETRIC_MA_TASKS)
    n_asym = sum(len(pools[t]) * (len(pools[t]) - 1)
                 for t in tasks.ASYMMETRIC_MA_TASKS)
    assert len(matches) == n_sym + n_asym
    assert all(m in biggym.ENVS_BY_TRACKS["goal_oriented_matches"]
               for m in matches)
    # symmetric pair registered in one orientation
    assert (
        tasks.get_match_env_name("sumo", "ant_ant", "proant_ant") in matches
        or tasks.get_match_env_name("sumo", "proant_ant", "ant_ant") in matches
    )

    # a symmetric match env actually builds, resets, and steps with
    # per-agent action groups
    race_matches = [m for m in matches if m.startswith("match_race_ma__")]
    env = biggym.create(race_matches[0], episode_length=16, auto_reset=False)
    s = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(s.obs)))
    groups = getattr(env.unwrapped, "group_action_shapes", None)
    assert groups and len(groups) == 2  # two match participants
    act = jnp.zeros(env.action_size)
    s2 = jax.jit(env.step)(s, act)
    assert bool(jnp.all(jnp.isfinite(s2.reward)))
    assert jnp.shape(s2.reward) == (2,)  # per-agent match rewards


def test_create_fn():
    fn = biggym.create_fn("ant", episode_length=8)
    env = fn()
    assert env.action_size == 8
