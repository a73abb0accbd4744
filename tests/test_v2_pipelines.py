"""v2 physics pipeline tests: analytic oracles + cross-checks.

No MuJoCo is available in this environment (the reference tests v2 against
golden MuJoCo trajectories, v2/test_utils.py:37-63); instead the pipelines
are validated against closed-form physics and against each other.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu.v2 import kinematics, mjcf
from brax_tpu.v2.generalized import pipeline as g_pipeline
from brax_tpu.v2.generalized import dynamics, mass
from brax_tpu.v2.generalized.base import State as GState
from brax_tpu.v2.positional import pipeline as p_pipeline
from brax_tpu.v2.spring import pipeline as s_pipeline

PENDULUM = """
<mujoco model="pendulum">
  <option gravity="0 0 -9.81" timestep="0.01"/>
  <worldbody>
    <body name="arm" pos="0 0 0">
      <joint axis="1 0 0" name="hinge" pos="0 0 0" type="hinge"/>
      <geom name="ball" pos="0 0.5 0" size="0.15" mass="1" type="sphere"/>
    </body>
  </worldbody>
</mujoco>
"""

DROP = """
<mujoco model="drop">
  <option gravity="0 0 -9.81" timestep="0.004"/>
  <worldbody>
    <geom name="floor" pos="0 0 0" size="10 10 1" type="plane"/>
    <body name="cap" pos="0 0 0.5">
      <joint name="root" type="free"/>
      <geom name="c1" fromto="-0.3 0 0 0.3 0 0" size="0.1" type="capsule"/>
    </body>
  </worldbody>
</mujoco>
"""

SPHERICAL = """
<mujoco model="spherical">
  <option gravity="0 0 -9.81" timestep="0.002"/>
  <worldbody>
    <body name="b" pos="0 0 0">
      <joint name="ball" type="ball"/>
      <geom name="m" pos="0 0.3 0" size="0.1" mass="1" type="sphere"/>
    </body>
  </worldbody>
</mujoco>
"""


@pytest.fixture(scope="module")
def pendulum_sys():
    return mjcf.loads(PENDULUM)


def test_generalized_pendulum_accel(pendulum_sys):
    """qdd at the first step matches -m g L / I."""
    sys = pendulum_sys
    state = g_pipeline.init(sys, jnp.zeros(1), jnp.zeros(1))
    state = jax.jit(g_pipeline.step)(sys, state, jnp.zeros(0))
    inertia = 1 * 0.5**2 + 0.4 * 1 * 0.15**2
    expected = -1 * 9.81 * 0.5 / inertia
    np.testing.assert_allclose(np.asarray(state.qdd), [expected], rtol=1e-3)


def test_generalized_energy_conservation():
    """Undamped spherical pendulum conserves energy over 1 s."""
    sys = mjcf.loads(SPHERICAL)
    state = g_pipeline.init(sys, sys.init_q, jnp.zeros(3))
    step = jax.jit(g_pipeline.step)
    inertia = 1 * 0.3**2 + 0.4 * 1 * 0.1**2

    def energy(state):
        from brax_tpu import maths

        ke = 0.5 * inertia * float(jnp.sum(state.qd**2))
        # height of the point mass: rotate its (0, .3, 0) offset by link rot
        p = maths.rotate(jnp.array([0.0, 0.3, 0.0]), state.x.rot[0])
        return ke + 9.81 * float(p[2])

    e0 = energy(state)
    for _ in range(500):
        state = step(sys, state, jnp.zeros(0))
    e1 = energy(state)
    assert abs(e1 - e0) < 0.05  # < ~2% of peak KE


def test_generalized_capsule_settles_on_plane():
    sys = mjcf.loads(DROP)
    state = g_pipeline.init(sys, sys.init_q, jnp.zeros(6))
    step = jax.jit(g_pipeline.step)
    for _ in range(250):
        state = step(sys, state, jnp.zeros(0))
    assert float(state.q[2]) == pytest.approx(0.1, abs=0.01)
    assert float(jnp.linalg.norm(state.qd)) < 0.05


def test_positional_capsule_settles_on_plane():
    sys = mjcf.loads(DROP)
    state = p_pipeline.init(sys, sys.init_q, jnp.zeros(6))
    step = jax.jit(p_pipeline.step)
    for _ in range(250):
        state = step(sys, state, jnp.zeros(0))
    assert float(state.q[2]) == pytest.approx(0.1, abs=0.02)
    assert float(jnp.linalg.norm(state.qd)) < 0.1


def _spring_tuned(sys, stiffness=10_000.0, damping=200.0):
    """Spring constants the reference validates with (spring backends are
    tuning-sensitive; reference spring tests always override the defaults,
    e.g. v2/spring/pipeline_test.py:98-102)."""
    n = sys.num_links()
    link = sys.link.replace(
        constraint_stiffness=jnp.full(n, stiffness),
        constraint_damping=jnp.full(n, damping),
        constraint_ang_damping=jnp.zeros(n),
        constraint_limit_stiffness=jnp.zeros(n),
    )
    return sys.replace(link=link, ang_damping=jnp.zeros(()))


def test_spring_capsule_settles_on_plane():
    sys = _spring_tuned(mjcf.loads(DROP))
    state = s_pipeline.init(sys, sys.init_q, jnp.zeros(6))
    step = jax.jit(s_pipeline.step)
    for _ in range(250):
        state = step(sys, state, jnp.zeros(0))
    # baumgarte stabilization rests with penetration ~ m g dt^2 / erp, a
    # softer equilibrium than the PBD/NNLS backends
    assert float(state.q[2]) == pytest.approx(0.1, abs=0.05)
    assert float(jnp.linalg.norm(state.qd)) < 0.1


def test_spring_pendulum_period():
    """The reference's spring oracle: one full period returns to the initial
    angular velocity (v2/spring/joints_test.py:28-80)."""
    from brax_tpu.v2 import kinematics as kin

    mass, radius, vel = 2.0, 0.125, 0.0625
    sys = mjcf.loads(PENDULUM)
    inertia_cm = 0.4 * mass * radius**2
    inertia_anchor = mass * 0.5**2 + inertia_cm
    period = 2 * np.pi * np.sqrt(inertia_anchor / (mass * 9.81 * 0.5))
    num_steps = 5000
    sys = sys.replace(dt=jnp.asarray(period / num_steps))
    sys = _spring_tuned(sys, stiffness=10_000.0, damping=0.0)
    sys = sys.replace(
        link=sys.link.replace(
            inertia=sys.link.inertia.replace(
                i=jnp.stack([inertia_cm * jnp.eye(3)]),
                mass=jnp.array([mass]),
            )
        )
    )
    state = s_pipeline.init(sys, sys.init_q, jnp.zeros(1))
    x, xd = kin.forward(sys, jnp.array([-jnp.pi / 2]), jnp.array([vel]))
    state = state.replace(x=x, xd=xd)
    step = jax.jit(s_pipeline.step)
    for _ in range(num_steps):
        state = step(sys, state, jnp.zeros(0))
    assert float(state.xd.ang[0, 0]) == pytest.approx(vel, abs=0.01)


def test_pipelines_agree_on_pendulum(pendulum_sys):
    """Generalized and positional integrate the same pendulum comparably."""
    sys = pendulum_sys
    qs = {}
    for name, pl in [("generalized", g_pipeline), ("positional", p_pipeline)]:
        state = pl.init(sys, jnp.zeros(1), jnp.zeros(1))
        step = jax.jit(pl.step)
        for _ in range(30):
            state = step(sys, state, jnp.zeros(0))
        qs[name] = float(state.q[0])
        assert float(jnp.abs(state.x.pos).max()) < 1.0, name
    assert qs["positional"] == pytest.approx(qs["generalized"], abs=0.05)


def test_mass_matrix_matches_analytic():
    """CRB mass matrix vs analytic point-jacobian M on the triple pendulum.

    Tolerance 5e-3: the CoM-frame spatial formulation matches the reference
    implementation bit-for-bit (verified against brax/v2 directly) and both
    carry ~1e-3-level float32 deviation from the exact analytic matrix.
    """
    from brax_tpu.v2.test_utils import _FIXTURES

    sys = mjcf.loads(_FIXTURES["triple_pendulum"])
    q = jnp.array([0.3, -0.5, 0.7])
    state = GState.zero(sys)
    x, xd = kinematics.forward(sys, q, jnp.zeros(3))
    state = state.replace(q=q, qd=jnp.zeros(3), x=x, xd=xd)
    state = dynamics.transform_com(sys, state)
    mx = np.asarray(mass.matrix(sys, state))

    # analytic: point-mass jacobians + sphere spin inertia
    th = np.asarray(q)
    r, m, i_s = 0.1, 1.0, 0.4 * 1.0 * 0.1**2

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def positions(th):
        a = np.cumsum(th)
        o, ps = np.zeros(3), []
        for i in range(3):
            ps.append(o + rot_x(a[i]) @ np.array([0, 0.3, 0]))
            o = o + rot_x(a[i]) @ np.array([0, 0.6, 0])
        return np.array(ps)

    jac = np.zeros((3, 3, 3))
    eps = 1e-6
    for i in range(3):
        e = np.zeros(3)
        e[i] = eps
        jac[:, :, i] = (positions(th + e) - positions(th - e)) / (2 * eps)
    m_an = sum(m * jac[k].T @ jac[k] for k in range(3))
    tril = np.tril(np.ones((3, 3)))
    m_an = m_an + i_s * (tril.T @ tril)

    np.testing.assert_allclose(mx, m_an, atol=5e-3)


def test_v2_ant_env_runs():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("ant", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (27,)
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert float(state.pipeline_state.x.pos[0, 2]) > 0.1


def test_v2_ant_env_positional_backend():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("ant", backend="positional", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))


def test_v2_halfcheetah_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("halfcheetah", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (17,)
    assert env.action_size == 6
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))


def test_v2_humanoid_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("humanoid", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (45,)
    assert env.action_size == 17
    step = jax.jit(env.step)
    for _ in range(3):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert float(state.pipeline_state.x.pos[0, 2]) > 0.5


def test_v2_inverted_pendulum_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("inverted_pendulum", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))


def test_v2_hopper_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("hopper", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (11,)
    assert env.action_size == 3
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert float(state.pipeline_state.x.pos[0, 2]) > 0.7  # healthy height
    assert float(state.done) == 0.0


def test_v2_walker2d_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("walker2d", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (17,)
    assert env.action_size == 6
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    assert float(state.done) == 0.0


def test_v2_reacher_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("reacher", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (11,)
    assert env.action_size == 2
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    # target stays where reset put it (kinematic: huge damping, no force)
    t0 = jax.jit(env.reset)(jax.random.PRNGKey(0)).pipeline_state.q[2:4]
    assert jnp.allclose(state.pipeline_state.q[2:4], t0, atol=1e-4)
    # reward is -distance - ctrl_cost and distance <= 0.42 by construction
    assert -0.45 < float(state.reward) <= 0.0


def test_v2_inverted_double_pendulum_env():
    from brax_tpu.v2 import envs as v2_envs

    env = v2_envs.create("inverted_double_pendulum", episode_length=100)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    assert state.obs.shape == (8,)
    step = jax.jit(env.step)
    for _ in range(5):
        state = step(state, jnp.zeros(env.action_size))
    assert bool(jnp.all(jnp.isfinite(state.obs)))
    # near-upright start: alive bonus dominates
    assert float(state.reward) > 5.0
