"""Analytic-physics oracle tests (reference test strategy: tests/physics_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu.sim import builder, initial
from brax_tpu.sim.config import (
    Actuator, Body, Box, Capsule, Collider, Config, FrozenAxes, Joint, Plane,
    Sphere,
)
from brax_tpu.sim.types import QP


def _ball_config(**kw):
    return Config(
        bodies=[Body(name="ball", colliders=[Collider(sphere=Sphere(radius=0.25))],
                     inertia=(1, 1, 1), mass=1.0)],
        gravity=(0.0, 0.0, -9.8),
        dt=1.0,
        substeps=1000,
        dynamics_mode="pbd",
        **kw,
    )


def test_projectile_motion():
    """x(t) = x0 + v0*t + 0.5*a*t^2 (reference physics_test.py:30-47)."""
    sys, art = builder.build(_ball_config())
    qp = QP(
        pos=jnp.array([[0.0, 0.0, 1.0]]),
        rot=jnp.array([[1.0, 0.0, 0.0, 0.0]]),
        vel=jnp.array([[1.0, 0.0, 0.0]]),
        ang=jnp.zeros((1, 3)),
    )
    qp, _ = jax.jit(sys.step)(qp, jnp.array([]))
    # f32 velocity-projection at 1000 substeps costs ~0.2% (the reference's
    # version of this test runs eagerly in float64 numpy via jumpy)
    np.testing.assert_allclose(qp.pos[0, 0], 1.0, atol=1e-2)
    np.testing.assert_allclose(qp.pos[0, 2], 1.0 - 0.5 * 9.8, rtol=1e-2)
    np.testing.assert_allclose(qp.vel[0, 2], -9.8, rtol=5e-3)


def test_ball_falls_onto_plane_and_rests():
    cfg = Config(
        bodies=[
            Body(name="ball", colliders=[Collider(sphere=Sphere(radius=0.25))],
                 inertia=(1, 1, 1), mass=1.0),
            Body(name="ground", colliders=[Collider(plane=Plane())],
                 inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
        ],
        gravity=(0.0, 0.0, -9.8),
        friction=1.0,
        dt=0.02,
        substeps=8,
        dynamics_mode="pbd",
    )
    sys, art = builder.build(cfg)
    qp = QP(
        pos=jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]]),
        rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1)),
        vel=jnp.zeros((2, 3)),
        ang=jnp.zeros((2, 3)),
    )
    step = jax.jit(sys.step)
    act = jnp.array([])
    for _ in range(100):
        qp, _ = step(qp, act)
    # ball should rest on the plane at ~radius height, not sink or explode
    assert 0.15 < float(qp.pos[0, 2]) < 0.35
    assert abs(float(qp.vel[0, 2])) < 0.1


def test_pendulum_joint_holds():
    """A pendulum's anchor distance stays fixed under PBD joint constraints."""
    cfg = Config(
        bodies=[
            Body(name="anchor", inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
            Body(name="bob", colliders=[Collider(capsule=Capsule(radius=0.1, length=0.4))],
                 inertia=(1, 1, 1), mass=1.0),
        ],
        joints=[
            Joint(name="hinge", parent="anchor", child="bob",
                  parent_offset=(0.0, 0.0, 0.0), child_offset=(0.0, 0.0, 0.5),
                  angle_limits=[(-180.0, 180.0)], angular_damping=0.0)
        ],
        gravity=(0.0, 0.0, -9.8),
        dt=0.02,
        substeps=8,
        dynamics_mode="pbd",
    )
    sys, art = builder.build(cfg)
    qp = initial.default_qp(art)
    step = jax.jit(sys.step)
    act = jnp.array([])
    for _ in range(50):
        qp, _ = step(qp, act)
        assert not bool(jnp.any(jnp.isnan(qp.pos)))
    # bob anchor point stays at the (frozen) anchor position
    from brax_tpu import maths

    anchor_world = qp.pos[1] + maths.rotate(jnp.array([0.0, 0.0, 0.5]), qp.rot[1])
    np.testing.assert_allclose(anchor_world, qp.pos[0], atol=0.05)


def test_default_qp_tree_placement():
    """Children are placed relative to parents via joint offsets."""
    cfg = Config(
        bodies=[
            Body(name="a", colliders=[Collider(sphere=Sphere(radius=0.1))],
                 inertia=(1, 1, 1), mass=1.0),
            Body(name="b", colliders=[Collider(sphere=Sphere(radius=0.1))],
                 inertia=(1, 1, 1), mass=1.0),
        ],
        joints=[
            Joint(name="j", parent="a", child="b",
                  parent_offset=(1.0, 0.0, 0.0), child_offset=(-1.0, 0.0, 0.0),
                  angle_limits=[(0.0, 0.0)])
        ],
        gravity=(0.0, 0.0, -9.8),
        dt=0.01,
        substeps=4,
        dynamics_mode="pbd",
    )
    sys, art = builder.build(cfg)
    qp = initial.default_qp(art)
    np.testing.assert_allclose(qp.pos[1, 0] - qp.pos[0, 0], 2.0, atol=1e-5)


def test_vmap_and_grad_through_step():
    """The step is batchable and differentiable (APG prerequisite)."""
    from brax_tpu.envs.ant import Ant

    env = Ant()
    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, 4)
    states = jax.vmap(env.reset)(keys)
    act = jnp.zeros((4, 8))
    nstates = jax.jit(jax.vmap(env.step))(states, act)
    assert nstates.obs.shape == (4, 27)

    def loss(a):
        s = env.step(jax.tree_util.tree_map(lambda x: x[0], states), a)
        return s.reward

    g = jax.grad(loss)(jnp.zeros(8))
    assert g.shape == (8,)
    assert not bool(jnp.any(jnp.isnan(g)))


def test_box_stacks_on_box():
    """SAT hull-hull: a falling box comes to rest on a static box."""
    cfg = Config(
        bodies=[
            Body(name="top", colliders=[Collider(box=Box(halfsize=(0.2, 0.2, 0.2)))],
                 inertia=(0.1, 0.1, 0.1), mass=1.0),
            Body(name="base", colliders=[Collider(box=Box(halfsize=(0.5, 0.5, 0.25)))],
                 inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
        ],
        gravity=(0.0, 0.0, -9.8),
        friction=1.0,
        elasticity=0.0,
        dt=0.02,
        substeps=8,
        dynamics_mode="pbd",
    )
    sys, art = builder.build(cfg)
    qp = QP(
        pos=jnp.array([[0.05, 0.0, 0.8], [0.0, 0.0, 0.25]]),
        rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (2, 1)),
        vel=jnp.zeros((2, 3)),
        ang=jnp.zeros((2, 3)),
    )
    step = jax.jit(sys.step)
    act = jnp.array([])
    for _ in range(100):
        qp, _ = step(qp, act)
    # rests on top of the base: base top face at z=0.5 + half-height 0.2
    assert 0.6 < float(qp.pos[0, 2]) < 0.8
    assert abs(float(qp.vel[0, 2])) < 0.1
    assert float(jnp.abs(qp.ang[0]).max()) < 0.5


def test_collider_cutoff_near_neighbors():
    """NearNeighbors culling: trajectories match the uncut sim when the
    cutoff still covers every active contact (balls far apart)."""
    def build(cutoff):
        cfg = Config(
            bodies=[
                Body(name=f"b{i}",
                     colliders=[Collider(sphere=Sphere(radius=0.2))],
                     inertia=(0.1, 0.1, 0.1), mass=1.0)
                for i in range(4)
            ] + [
                Body(name="ground", colliders=[Collider(plane=Plane())],
                     inertia=(1, 1, 1), mass=1.0, frozen=FrozenAxes(all=True)),
            ],
            gravity=(0.0, 0.0, -9.8),
            friction=0.6,
            dt=0.02,
            substeps=8,
            dynamics_mode="pbd",
            collider_cutoff=cutoff,
        )
        return builder.build(cfg)[0]

    qp0 = QP(
        pos=jnp.array([[0.0, 0, 1.0], [3.0, 0, 1.2], [0, 3.0, 0.9], [3.0, 3.0, 1.1],
                       [0.0, 0.0, 0.0]]),
        rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), (5, 1)),
        vel=jnp.zeros((5, 3)),
        ang=jnp.zeros((5, 3)),
    )
    outs = {}
    for cutoff in (0, 4):
        sys = build(cutoff)
        qp = qp0
        step = jax.jit(sys.step)
        for _ in range(30):
            qp, _ = step(qp, jnp.array([]))
        outs[cutoff] = np.asarray(qp.pos)
    # cutoff=4 culls the 6-pair ball-ball group but keeps every plane pair
    # (cull distance is body-center based, so it must cover active contacts)
    assert np.all(np.abs(outs[4][:4, 2] - 0.2) < 0.05)
    np.testing.assert_allclose(outs[0], outs[4], atol=1e-4)
