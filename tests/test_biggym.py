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
