"""CPU performance regression gates.

Ports the reference's CI perf floor (ant/fetch >= 1000 env-steps/s at batch
128, /root/reference/brax/tests/env_test.py:27,30-74) and adds floors for
the v2 backends at CI shapes, so a throughput regression fails the suite
instead of rotting silently.  Floors sit well under the measured
single-core CI-box numbers (ant 1560, fetch 1840; v2 spring 6.7k /
positional 6.0k / generalized 4.5k env-steps/s) because timing under full
suite load on a one-core box is noisy; throughput is best-of-5 runs.
"""

import time

import jax
import jax.numpy as jnp
import pytest

from brax_tpu import envs

_V1_FLOORS = {"ant": 1000.0, "fetch": 1000.0}  # reference's own floors
_V2_FLOORS = {"spring": 2000.0, "positional": 1800.0, "generalized": 1200.0}


def _throughput(step_fn, state, n_steps, batch):
    state = jax.block_until_ready(step_fn(state))  # compile
    state = jax.block_until_ready(step_fn(state))  # second trace (weak types)
    best = 0.0
    for _ in range(5):
        t0 = time.perf_counter()
        state = jax.block_until_ready(step_fn(state))
        best = max(best, batch * n_steps / (time.perf_counter() - t0))
    return best


@pytest.mark.parametrize("name", sorted(_V1_FLOORS))
def test_env_sps_floor(name):
    batch, length = 128, 200
    env = envs.create(name, episode_length=1000, auto_reset=True, batch_size=batch)
    state = jax.jit(env.reset)(jax.random.split(jax.random.PRNGKey(0), batch))

    @jax.jit
    def run(state):
        def body(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            act = jax.random.uniform(
                kk, (batch, env.action_size), minval=-1, maxval=1
            )
            return (env.step(s, act), k), ()

        return jax.lax.scan(body, (state, jax.random.PRNGKey(1)), (), length=length)[0][0]

    sps = _throughput(run, state, length, batch)
    assert sps > _V1_FLOORS[name], f"{name}: {sps:,.0f} env-steps/s"


@pytest.mark.parametrize("backend", sorted(_V2_FLOORS))
def test_v2_backend_sps_floor(backend):
    from brax_tpu.v2.envs import ant as ant_mod

    batch, length = 8, 50
    env = ant_mod.Ant(backend=backend)
    state = jax.jit(jax.vmap(env.reset))(jax.random.split(jax.random.PRNGKey(0), batch))
    act = jnp.zeros((batch, env.action_size))

    @jax.jit
    def run(state):
        def body(s, _):
            return jax.vmap(env.step)(s, jnp.broadcast_to(act, act.shape)), ()

        return jax.lax.scan(body, state, (), length=length)[0]

    sps = _throughput(run, state, length, batch)
    assert sps > _V2_FLOORS[backend], f"{backend}: {sps:,.0f} env-steps/s"
