"""Domain randomization over v2 Systems (brax_tpu/v2/randomization.py).

Role parity: the v1 module tests + reference
brax/experimental/tracing/{customize,randomizers}.py.
"""

import jax
import jax.numpy as jnp
import numpy as np

from brax_tpu.v2 import envs as v2_envs
from brax_tpu.v2 import randomization as v2_rand


def test_gravity_population_diverges_trajectories():
    env = v2_envs.get_environment("inverted_pendulum")
    batch = 4
    wrapped = v2_rand.DomainRandomizationWrapper(
        env, v2_rand.gravity_randomizer(0.5, 1.5), jax.random.PRNGKey(0), batch
    )
    state = jax.jit(wrapped.reset)(jax.random.PRNGKey(1))
    assert state.obs.shape[0] == batch

    step = jax.jit(wrapped.step)
    # identical zero actions: any divergence comes from the physics params
    for _ in range(5):
        state = step(state, jnp.zeros((batch, env.action_size)))
    assert np.isfinite(np.asarray(state.obs)).all()

    gz = np.asarray(wrapped.sys_batch.gravity)[:, 2]
    assert len(np.unique(gz)) == batch
    pole = np.asarray(state.pipeline_state.q)[:, 1]
    assert len(np.unique(pole)) > 1


def test_randomizers_run_on_ant():
    env = v2_envs.get_environment("ant")
    for make in (
        v2_rand.friction_randomizer,
        v2_rand.mass_randomizer,
        v2_rand.gear_randomizer,
    ):
        wrapped = v2_rand.DomainRandomizationWrapper(
            env, make(), jax.random.PRNGKey(2), 2
        )
        state = jax.jit(wrapped.reset)(jax.random.PRNGKey(3))
        state = jax.jit(wrapped.step)(state, jnp.zeros((2, env.action_size)))
        assert np.isfinite(np.asarray(state.obs)).all()
