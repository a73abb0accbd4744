"""ES / ARS / APG trainer tests on the `fast` env.

Parity: reference agents' train_test.py files (es: reward>140 @65536 steps;
apg: reward>50; ars: params round-trip only — we add a light learning check).
"""

import pickle

import jax
import jax.numpy as jnp
import pytest

from brax_tpu import envs
from brax_tpu.training.agents.ars import train as ars
from brax_tpu.training.agents.apg import train as apg
from brax_tpu.training.agents.es import train as es


def test_es_learns_fast_env():
    fast = envs._envs["fast"]()
    _, _, metrics = es.train(
        environment=fast,
        num_timesteps=65536,
        episode_length=128,
        learning_rate=0.1,
        num_evals=2,
    )
    assert metrics["eval/episode_reward"] > 140


def test_es_params_roundtrip():
    fast = envs._envs["fast"]()
    make_policy, params, _ = es.train(
        fast, num_timesteps=128, episode_length=128, normalize_observations=True
    )
    params2 = pickle.loads(pickle.dumps(params))
    rng = jax.random.PRNGKey(0)
    obs = jnp.zeros((2,))
    act1, _ = make_policy(params, deterministic=True)(obs, rng)
    act2, _ = make_policy(params2, deterministic=True)(obs, rng)
    assert jnp.allclose(act1, act2)


class _LinearFast(envs.Env):
    """fast-env variant learnable by a zero-initialized LINEAR policy.

    On `fast` itself, obs starts (and stays) at zero under a zero linear
    policy, so action = obs @ W = 0 forever — a degenerate fixed point (the
    reference accordingly has no ARS learning test).  Here obs carries a
    constant bias feature so perturbed linear policies act."""

    def __init__(self):
        super().__init__(config=None)
        self._dt = 0.02

    def reset(self, rng):
        import jax.numpy as jnp
        from brax_tpu.sim.types import QP

        zero = jnp.zeros(1)
        qp = QP(pos=zero, vel=zero, rot=zero, ang=zero)
        obs = jnp.array([1.0, 0.0])
        reward, done = jnp.zeros(2)
        return envs.State(qp, obs, reward, done)

    def step(self, state, action):
        import jax.numpy as jnp

        vel = state.qp.vel + jnp.clip(action, -1, 1) * self._dt
        pos = state.qp.pos + vel * self._dt
        qp = state.qp.replace(pos=pos, vel=vel)
        obs = jnp.array([1.0, vel[0]])
        return state.replace(qp=qp, obs=obs, reward=pos[0])

    @property
    def observation_size(self):
        return 2

    @property
    def action_size(self):
        return 1


def test_ars_learns_linear_env():
    # deterministic (fixed seed, deterministic env/policy); at saturation the
    # antithetic signal vanishes so long runs oscillate — gate a short run
    _, _, metrics = ars.train(
        _LinearFast(),
        num_timesteps=131072,
        episode_length=128,
        number_of_directions=60,
        top_directions=20,
        step_size=0.3,
        exploration_noise_std=0.2,
        normalize_observations=True,
        num_evals=2,
    )
    assert metrics["eval/episode_reward"] > 50


def test_ars_params_roundtrip():
    fast = envs._envs["fast"]()
    make_policy, params, _ = ars.train(
        fast, num_timesteps=128, episode_length=128, normalize_observations=True
    )
    params2 = pickle.loads(pickle.dumps(params))
    rng = jax.random.PRNGKey(0)
    obs = jnp.zeros((2,))
    act1, _ = make_policy(params)(obs, rng)
    act2, _ = make_policy(params2)(obs, rng)
    # the zero reward-std of the degenerate fast env is guarded to unit
    # scale inside ARS, so params (and actions) must stay finite
    assert jnp.all(jnp.isfinite(act1))
    assert jnp.allclose(act1, act2)


def test_apg_learns_fast_env():
    """Gradients flow through the differentiable env step."""
    fast = envs._envs["fast"]()
    _, _, metrics = apg.train(
        fast,
        episode_length=128,
        num_envs=64,
        num_evals=200,
        learning_rate=3e-3,
        normalize_observations=True,
        seed=1,
    )
    assert metrics["eval/episode_reward"] > 50


def test_gradients_flow_through_contact_solver():
    """BASELINE config 4: APG needs d(reward)/d(action) through the PBD
    contact solver (ant in ground contact) to be finite and nonzero."""
    import jax

    env = envs._envs["ant"]()
    state = env.reset(jax.random.PRNGKey(0))
    # settle into ground contact so the contact branch is active
    for _ in range(5):
        state = env.step(state, jnp.zeros(8))

    def loss(action):
        s = env.step(state, action)
        s = env.step(s, action)
        return s.reward

    g = jax.grad(loss)(jnp.zeros(8))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0


@pytest.mark.parametrize("name", ["grasp", "fetch"])
def test_gradients_flow_grasp_fetch(name):
    """BASELINE config 4 names grasp + fetch specifically: APG gradients
    must flow through their contact solvers (claw/object and dog/ground
    contacts), not just ant's."""
    import jax

    env = envs._envs[name]()
    state = env.reset(jax.random.PRNGKey(0))
    na = env.action_size
    # settle so contacts are active (grasp claw closes on the ball under
    # zero action; fetch starts on the ground)
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(na))

    def loss(action):
        # one step through the contact solver: enough to prove gradient
        # flow, and grasp's graph is big enough that two chained steps
        # roughly double an already-long CPU-CI grad compile
        return env.step(state, action).reward

    g = jax.jit(jax.grad(loss))(jnp.zeros(na))
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.max(jnp.abs(g))) > 0.0
