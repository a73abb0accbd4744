"""v2 spatial algebra + MJCF compiler unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu import maths
from brax_tpu.v2 import mjcf
from brax_tpu.v2.base import Inertia, Motion, Transform


def _rand_transform(key, shape=()):
    k1, k2 = jax.random.split(key)
    pos = jax.random.normal(k1, shape + (3,))
    rot = jax.random.normal(k2, shape + (4,))
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return Transform(pos=pos, rot=rot)


def test_transform_compose_inverse():
    t = _rand_transform(jax.random.PRNGKey(0), (5,))
    u = _rand_transform(jax.random.PRNGKey(1), (5,))
    # (t.do(u)).to_local(t) recovers u
    v = t.do(u).to_local(t)
    np.testing.assert_allclose(np.asarray(v.pos), np.asarray(u.pos), atol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.sum(np.asarray(v.rot) * np.asarray(u.rot), axis=-1)),
        np.ones(5),
        atol=1e-5,
    )


def test_transform_motion_roundtrip():
    t = _rand_transform(jax.random.PRNGKey(2), (4,))
    m = Motion(
        ang=jax.random.normal(jax.random.PRNGKey(3), (4, 3)),
        vel=jax.random.normal(jax.random.PRNGKey(4), (4, 3)),
    )
    m2 = t.inv().do(t.do(m))
    np.testing.assert_allclose(np.asarray(m2.ang), np.asarray(m.ang), atol=1e-5)


def test_inertia_transform_mass_preserved():
    t = _rand_transform(jax.random.PRNGKey(5), (3,))
    it = Inertia(
        transform=Transform.zero((3,)),
        i=jnp.stack([jnp.diag(jnp.array([1.0, 2.0, 3.0]))] * 3),
        mass=jnp.array([1.0, 2.0, 3.0]),
    )
    out = t.do(it)
    np.testing.assert_allclose(np.asarray(out.mass), np.asarray(it.mass))
    # rotation preserves the inertia eigenvalue sum; translation adds m*d^2*2
    d2 = np.sum(np.asarray(t.pos) ** 2, axis=-1)
    tr = np.trace(np.asarray(out.i), axis1=-2, axis2=-1)
    np.testing.assert_allclose(tr, 6.0 + 2 * d2 * np.asarray(it.mass), rtol=5e-3)


PENDULUM = """
<mujoco model="pendulum">
  <compiler inertiafromgeom="true"/>
  <option gravity="0 0 -9.81" timestep="0.01"/>
  <worldbody>
    <body name="arm" pos="0 0 0">
      <joint axis="1 0 0" name="hinge" pos="0 0 0" type="hinge"/>
      <geom name="ball" pos="0 0.5 0" size="0.15" mass="1" type="sphere"/>
    </body>
  </worldbody>
</mujoco>
"""


def test_mjcf_pendulum_inertia():
    sys = mjcf.loads(PENDULUM)
    assert sys.link_types == "1"
    np.testing.assert_allclose(np.asarray(sys.link.inertia.mass), [1.0])
    np.testing.assert_allclose(
        np.asarray(sys.link.inertia.transform.pos), [[0, 0.5, 0]]
    )
    # solid sphere inertia 2/5 m r^2
    np.testing.assert_allclose(
        np.asarray(sys.link.inertia.i[0]),
        np.eye(3) * 0.4 * 0.15**2,
        atol=1e-7,
    )
    # dof invweight = 1 / (m L^2 + I_sphere)
    expected = 1.0 / (0.25 + 0.4 * 0.15**2)
    np.testing.assert_allclose(np.asarray(sys.dof.invweight), [expected], rtol=1e-5)


def test_mjcf_capsule_fromto_and_degrees():
    xml = """
<mujoco>
  <compiler angle="degree" inertiafromgeom="true"/>
  <worldbody>
    <body name="b" pos="1 2 3">
      <joint axis="0 0 1" name="j" type="hinge" range="-30 30" limited="true"/>
      <geom name="c" fromto="0 0 0 0.4 0 0" size="0.1" type="capsule"/>
    </body>
  </worldbody>
</mujoco>
"""
    sys = mjcf.loads(xml)
    # limits converted to radians
    lo, hi = sys.dof.limit
    np.testing.assert_allclose(np.asarray(lo), [-np.pi / 6], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(hi), [np.pi / 6], rtol=1e-6)
    # capsule frame: midpoint pos, z-axis along +x
    geom = sys.geoms[0]
    np.testing.assert_allclose(np.asarray(geom.transform.pos), [0.2, 0, 0], atol=1e-7)
    z_world = maths.rotate(jnp.array([0.0, 0, 1]), geom.transform.rot)
    np.testing.assert_allclose(np.asarray(z_world), [1, 0, 0], atol=1e-6)
    assert float(geom.length) == pytest.approx(0.4)


def test_mjcf_mesh_inertia_matches_box():
    """A cube mesh must produce the analytic box inertia."""
    h = 0.2
    corners = np.array(
        [[sx * h, sy * h, sz * h] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]
    )
    m, inertia, com = mjcf._mesh_mass_inertia(corners, None, 500.0, None)
    vol = (2 * h) ** 3
    assert m == pytest.approx(500.0 * vol, rel=1e-6)
    np.testing.assert_allclose(com, np.zeros(3), atol=1e-9)
    expected = m / 3.0 * (h**2 + h**2)
    np.testing.assert_allclose(inertia, np.eye(3) * expected, atol=1e-8)


def test_mjcf_body_inertia_two_geoms():
    """Two spheres combine into the correct CoM and principal inertia."""
    xml = """
<mujoco>
  <worldbody>
    <body name="b" pos="0 0 0">
      <joint axis="1 0 0" name="j" type="hinge"/>
      <geom name="s1" pos="0 0 0" size="0.1" mass="1" type="sphere"/>
      <geom name="s2" pos="1 0 0" size="0.1" mass="3" type="sphere"/>
    </body>
  </worldbody>
</mujoco>
"""
    sys = mjcf.loads(xml)
    np.testing.assert_allclose(np.asarray(sys.link.inertia.mass), [4.0])
    np.testing.assert_allclose(
        np.asarray(sys.link.inertia.transform.pos), [[0.75, 0, 0]], atol=1e-7
    )
    # parallel axis: about CoM, I_yy = i1 + 1*0.75^2 + i2 + 3*0.25^2
    i_sph1 = 0.4 * 1 * 0.01
    i_sph2 = 0.4 * 3 * 0.01
    iyy = i_sph1 + 1 * 0.75**2 + i_sph2 + 3 * 0.25**2
    evals = np.sort(np.diag(np.asarray(sys.link.inertia.i[0])))[::-1]
    assert max(evals[:2]) == pytest.approx(iyy, rel=1e-5)


def test_mjcf_custom_params():
    xml = """
<mujoco>
  <custom>
    <numeric data="0.3" name="baumgarte_erp"/>
    <numeric data="0.7" name="elasticity"/>
    <numeric data="1 2" name="init_qpos"/>
  </custom>
  <worldbody>
    <body name="a"><joint name="j1" type="hinge"/><geom name="g1" size="0.1" mass="1"/></body>
    <body name="b"><joint name="j2" type="hinge"/><geom name="g2" size="0.1" mass="1"/></body>
  </worldbody>
</mujoco>
"""
    sys = mjcf.loads(xml)
    assert float(sys.baumgarte_erp) == pytest.approx(0.3)
    np.testing.assert_allclose(np.asarray(sys.geoms[0].elasticity), 0.7)
    np.testing.assert_allclose(np.asarray(sys.init_q), [1.0, 2.0])


def test_urdf_import_laikago():
    """Native URDF importer: quadruped with fixed-joint fusing + meshes."""
    import os

    from brax_tpu.v2 import kinematics, urdf

    path = "/root/reference/brax/v2/test_data/laikago/laikago_toes_zup.urdf"
    if not os.path.exists(path):
        pytest.skip("laikago fixture unavailable")
    sys = urdf.load(path)
    # chassis (free) + 4 legs x 3 continuous joints; 4 fixed toes fused away
    assert sys.link_types == "f" + "1" * 12
    assert sys.q_size() == 19 and sys.qd_size() == 18
    np.testing.assert_allclose(float(sys.link.inertia.mass[0]), 13.715)
    # toes (0.1 kg) merged into the 0.241 kg lower legs
    lower = np.asarray(sys.link.inertia.mass)[3::3]
    np.testing.assert_allclose(lower, 0.341, atol=1e-6)
    x, xd = kinematics.forward(sys, sys.init_q, jnp.zeros(sys.qd_size()))
    assert bool(jnp.all(jnp.isfinite(x.pos)))


def test_inverse_kinematics_planar_root_roundtrip():
    """Mixed slide/hinge joints (planar roots) invert exactly: per-dof
    selection between prismatic coordinates and the single-revolute-axis
    quaternion angle.  The reference's inverse() reads 2/3-dof joints as
    angles only (kinematics.py:284-290) and mis-reads planar roots; ours
    roundtrips forward() -> inverse() to float32 eps."""
    import jax
    import jax.numpy as jnp

    from brax_tpu.v2 import kinematics
    from brax_tpu.v2.envs import halfcheetah as hc

    sys = hc.Halfcheetah(backend="generalized").sys
    rng = jax.random.PRNGKey(0)
    q = sys.init_q + 0.2 * jax.random.normal(rng, (sys.q_size(),))
    qd = 0.3 * jax.random.normal(jax.random.fold_in(rng, 1), (sys.qd_size(),))
    x, xd = kinematics.forward(sys, q, qd)
    q2, qd2 = kinematics.inverse(sys, x, xd)
    assert float(jnp.max(jnp.abs(q - q2))) < 1e-5
    assert float(jnp.max(jnp.abs(qd - qd2))) < 1e-5
