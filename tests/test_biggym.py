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
