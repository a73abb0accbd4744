"""Fused Pallas physics kernel: math parity + dispatch behavior.

The kernel math (brax_tpu/sim/kernels._build_tile_step) is plain jnp in a
rows-in-lanes layout, so its numerics are verified here on CPU against the
vmapped reference path; the Mosaic compilation itself only runs on TPU (the
dispatch test asserts the CPU fallback stays exact).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu.envs import ant as ant_mod
from brax_tpu.sim import kernels


@pytest.fixture(scope="module")
def ant_batch():
    env = ant_mod.Ant(use_contact_forces=True)
    n = 64
    rng = jax.random.PRNGKey(0)
    qp0 = jax.vmap(lambda k: env.reset(k).qp)(jax.random.split(rng, n))
    act = jax.random.uniform(jax.random.PRNGKey(7), (n, 8), minval=-1, maxval=1)
    return env, qp0, act


def test_supported(ant_batch):
    env, *_ = ant_batch
    assert kernels.supported(env.sys)


def test_tile_step_math_matches_jnp_path(ant_batch):
    """The kernel body (jnp, lane layout) matches the reference path."""
    env, qp0, act = ant_batch
    sys_ = env.sys
    n = qp0.pos.shape[0]

    tile_step = kernels._build_tile_step(sys_)
    t = lambda x: jnp.transpose(x, (1, 2, 0))
    outs = jax.jit(tile_step)(t(qp0.pos), t(qp0.rot), t(qp0.vel), t(qp0.ang), act.T)
    u = lambda x: jnp.transpose(x, (2, 0, 1))

    qp_ref, info_ref = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))(qp0, act)
    # settle a few steps so contacts activate, then compare one more step
    np.testing.assert_allclose(np.asarray(u(outs[0])), np.asarray(qp_ref.pos), atol=2e-5)
    np.testing.assert_allclose(np.asarray(u(outs[1])), np.asarray(qp_ref.rot), atol=2e-5)
    np.testing.assert_allclose(np.asarray(u(outs[2])), np.asarray(qp_ref.vel), atol=5e-4)
    np.testing.assert_allclose(np.asarray(u(outs[3])), np.asarray(qp_ref.ang), atol=5e-4)
    np.testing.assert_allclose(
        np.asarray(u(outs[4])), np.asarray(info_ref.contact.vel), atol=5e-4
    )


def test_tile_step_math_in_contact(ant_batch):
    """Same comparison from a settled, contact-rich state."""
    env, qp0, act = ant_batch
    sys_ = env.sys
    step_ref = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))
    qp = qp0
    for _ in range(10):
        qp, _ = step_ref(qp, act)

    tile_step = kernels._build_tile_step(sys_)
    t = lambda x: jnp.transpose(x, (1, 2, 0))
    u = lambda x: jnp.transpose(x, (2, 0, 1))
    outs = jax.jit(tile_step)(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act.T)
    qp_ref, _ = step_ref(qp, act)
    np.testing.assert_allclose(np.asarray(u(outs[0])), np.asarray(qp_ref.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u(outs[2])), np.asarray(qp_ref.vel), atol=3e-3)


def test_tile_step_math_humanoid():
    """Kernel math parity on a spherical-joint + capsule-capsule env."""
    from brax_tpu.envs import humanoid as humanoid_mod

    env = humanoid_mod.Humanoid()
    sys_ = env.sys
    assert kernels.supported(sys_)
    n = 16
    qp = jax.vmap(lambda k: env.reset(k).qp)(
        jax.random.split(jax.random.PRNGKey(0), n)
    )
    act = jax.random.uniform(
        jax.random.PRNGKey(7), (n, env.action_size), minval=-1, maxval=1
    )
    step_ref = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))
    for _ in range(5):
        qp, _ = step_ref(qp, act)
    tile_step = kernels._build_tile_step(sys_)
    t = lambda x: jnp.transpose(x, (1, 2, 0))
    u = lambda x: jnp.transpose(x, (2, 0, 1))
    outs = jax.jit(tile_step)(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act.T)
    qp_ref, _ = step_ref(qp, act)
    np.testing.assert_allclose(np.asarray(u(outs[0])), np.asarray(qp_ref.pos), atol=1e-4)
    np.testing.assert_allclose(np.asarray(u(outs[3])), np.asarray(qp_ref.ang), atol=5e-3)


def test_tile_step_math_spring_mode():
    """Spring-mode kernel math parity on a small legacy-spring scene.

    (ant legacy_spring compiles ~20 min on this CPU; a 2-body scene keeps
    the unrolled substep graph CI-sized.)
    """
    from brax_tpu.sim import builder
    from brax_tpu.sim.config import (
        Actuator, Body, Capsule, Collider, Config, FrozenAxes, Joint, Plane,
    )
    from brax_tpu.sim.types import QP

    cfg = Config(
        bodies=[
            Body(name="a", colliders=[Collider(capsule=Capsule(radius=0.1, length=0.6))],
                 inertia=(0.1, 0.1, 0.1), mass=1.0),
            Body(name="b", colliders=[Collider(capsule=Capsule(radius=0.1, length=0.6))],
                 inertia=(0.1, 0.1, 0.1), mass=1.0),
            Body(name="ground", colliders=[Collider(plane=Plane())],
                 inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
        ],
        joints=[
            Joint(name="j", parent="a", child="b", stiffness=5000.0,
                  parent_offset=(0, 0, -0.35), child_offset=(0, 0, 0.35),
                  angle_limits=[(-60, 60)], spring_damping=20.0,
                  limit_strength=200.0)
        ],
        actuators=[Actuator(name="j", joint="j", strength=20.0, kind="torque")],
        gravity=(0.0, 0.0, -9.8),
        friction=0.8,
        dt=0.02,
        substeps=4,
        dynamics_mode="legacy_spring",
    )
    sys_, art = builder.build(cfg)
    assert kernels.supported(sys_)
    n = 16
    qp = QP(
        pos=jnp.tile(jnp.array([[0.0, 0.0, 0.8], [0.0, 0.0, 0.2], [0.0, 0.0, 0.0]]), (n, 1, 1)),
        rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (n, 3, 1)),
        vel=jnp.zeros((n, 3, 3)),
        ang=jnp.zeros((n, 3, 3)),
    )
    # jiggle initial states so contacts/limits activate differently per env
    qp = qp.replace(
        vel=0.3 * jax.random.normal(jax.random.PRNGKey(0), (n, 3, 3))
    )
    act = jax.random.uniform(jax.random.PRNGKey(7), (n, 1), minval=-1, maxval=1)
    step_ref = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))
    for _ in range(8):
        qp, _ = step_ref(qp, act)
    tile_step = kernels._build_tile_step(sys_)
    t = lambda x: jnp.transpose(x, (1, 2, 0))
    u = lambda x: jnp.transpose(x, (2, 0, 1))
    outs = jax.jit(tile_step)(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act.T)
    qp_ref, _ = step_ref(qp, act)
    np.testing.assert_allclose(np.asarray(u(outs[0])), np.asarray(qp_ref.pos), atol=1e-5)
    np.testing.assert_allclose(np.asarray(u(outs[2])), np.asarray(qp_ref.vel), atol=1e-3)


def test_dispatch_cpu_fallback_exact(ant_batch):
    """With the kernel globally enabled on CPU, results stay bit-identical
    (the custom_vmap rule falls back to plain vmap off-TPU)."""
    env, qp0, act = ant_batch
    sys_ = env.sys
    step = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))
    qp_ref, _ = step(qp_ref0 := qp0, act)
    kernels.enable(True)
    try:
        qp_on, _ = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))(qp0, act)
    finally:
        kernels.enable(False)
    np.testing.assert_array_equal(np.asarray(qp_on.pos), np.asarray(qp_ref.pos))


def _small_spring_scene():
    from brax_tpu.sim import builder
    from brax_tpu.sim.config import (
        Actuator, Body, Capsule, Collider, Config, FrozenAxes, Joint, Plane,
    )

    cfg = Config(
        bodies=[
            Body(name="a", colliders=[Collider(capsule=Capsule(radius=0.1, length=0.6))],
                 inertia=(0.1, 0.1, 0.1), mass=1.0),
            Body(name="b", colliders=[Collider(capsule=Capsule(radius=0.1, length=0.6))],
                 inertia=(0.1, 0.1, 0.1), mass=1.0),
            Body(name="ground", colliders=[Collider(plane=Plane())],
                 inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
        ],
        joints=[
            Joint(name="j", parent="a", child="b", stiffness=5000.0,
                  parent_offset=(0, 0, -0.35), child_offset=(0, 0, 0.35),
                  angle_limits=[(-60, 60)], spring_damping=20.0,
                  limit_strength=200.0)
        ],
        actuators=[Actuator(name="j", joint="j", strength=20.0, kind="torque")],
        gravity=(0.0, 0.0, -9.8),
        friction=0.8,
        dt=0.02,
        substeps=4,
        dynamics_mode="legacy_spring",
    )
    return builder.build(cfg)[0]


def test_rolled_substeps_match_unrolled(ant_batch):
    """lax.fori_loop substeps (compile-time fix: one traced body instead of
    `substeps` copies) must be numerically identical to the unrolled form,
    in both dynamics modes.  Spring mode uses the 2-body scene — unrolled
    full-ant spring is exactly the >20-min compile this change removes."""
    env, qp0, act = ant_batch
    t = lambda x: jnp.transpose(x, (1, 2, 0))

    pbd_args = (t(qp0.pos), t(qp0.rot), t(qp0.vel), t(qp0.ang), act.T)
    spring_sys = _small_spring_scene()
    n = 16
    sp_qp_pos = jnp.tile(
        jnp.array([[0.0, 0.0, 0.8], [0.0, 0.0, 0.2], [0.0, 0.0, 0.0]]), (n, 1, 1)
    )
    spring_args = (
        t(sp_qp_pos),
        t(jnp.tile(jnp.array([1.0, 0, 0, 0]), (n, 3, 1))),
        t(0.3 * jax.random.normal(jax.random.PRNGKey(0), (n, 3, 3))),
        t(jnp.zeros((n, 3, 3))),
        jax.random.uniform(jax.random.PRNGKey(7), (n, 1), minval=-1, maxval=1).T,
    )

    # auto policy: spring-ant (10 substeps) rolls, PBD-ant (5) stays on its
    # benchmarked unrolled form
    from brax_tpu.envs import ant as ant_mod

    assert ant_mod.Ant(legacy_spring=True).sys.substeps >= kernels._ROLL_MIN
    assert env.sys.substeps // 2 < kernels._ROLL_MIN

    for sys_, args in ((env.sys, pbd_args), (spring_sys, spring_args)):
        rolled = jax.jit(kernels._build_tile_step(sys_, roll_substeps=True))
        unrolled = jax.jit(kernels._build_tile_step(sys_, roll_substeps=False))
        for a, b in zip(rolled(*args), unrolled(*args)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6
            )


def test_tile_step_math_composed_scene():
    """Fused-kernel math parity on a composed multi-agent scene (the
    BASELINE config-5 bench enables the kernel for these systems)."""
    from brax_tpu.composer import envs as cenvs

    env = cenvs.create_env("chase", episode_length=16, auto_reset=False,
                           num_agents=2)
    inner = env
    while hasattr(inner, "env"):
        inner = inner.env
    sys_ = inner.sys
    assert kernels.supported(sys_)

    n = 16
    qp0 = jax.vmap(lambda k: inner.reset(k).qp)(
        jax.random.split(jax.random.PRNGKey(0), n)
    )
    act = jax.random.uniform(
        jax.random.PRNGKey(7), (n, inner.action_size), minval=-1, maxval=1
    )
    step_ref = jax.jit(jax.vmap(sys_.step, in_axes=(0, 0)))
    qp = qp0
    for _ in range(4):  # activate contacts
        qp, _ = step_ref(qp, act)

    tile_step = kernels._build_tile_step(sys_)
    t = lambda x: jnp.transpose(x, (1, 2, 0))
    u = lambda x: jnp.transpose(x, (2, 0, 1))
    outs = jax.jit(tile_step)(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act.T)
    qp_ref, _ = step_ref(qp, act)
    np.testing.assert_allclose(
        np.asarray(u(outs[0])), np.asarray(qp_ref.pos), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(u(outs[2])), np.asarray(qp_ref.vel), atol=1e-4
    )
