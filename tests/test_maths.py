"""Quaternion algebra identities + batched-op consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu import maths


def rand_quat(key, shape=()):
    q = jax.random.normal(key, shape + (4,))
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def test_rotate_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    q = rand_quat(k1, (32,))
    v = jax.random.normal(k2, (32, 3))
    out = maths.inv_rotate(maths.rotate(v, q), q)
    np.testing.assert_allclose(out, v, atol=1e-5)


def test_quat_mul_identity():
    key = jax.random.PRNGKey(1)
    q = rand_quat(key, (16,))
    ident = jnp.tile(jnp.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(maths.quat_mul(q, ident), q, atol=1e-6)
    np.testing.assert_allclose(maths.quat_mul(ident, q), q, atol=1e-6)


def test_quat_inv():
    key = jax.random.PRNGKey(2)
    q = rand_quat(key, (16,))
    prod = maths.quat_mul(q, maths.quat_inv(q))
    expect = jnp.tile(jnp.array([1.0, 0, 0, 0]), (16, 1))
    np.testing.assert_allclose(prod, expect, atol=1e-5)


def test_euler_to_quat_90z():
    q = maths.euler_to_quat(jnp.array([0.0, 0.0, 90.0]))
    v = maths.rotate(jnp.array([1.0, 0.0, 0.0]), q)
    np.testing.assert_allclose(v, jnp.array([0.0, 1.0, 0.0]), atol=1e-6)


def test_euler_roundtrip():
    angles = jnp.array([25.0, -40.0, 70.0])
    q = maths.euler_to_quat(angles)
    out = maths.quat_to_euler(q) * 180 / jnp.pi
    np.testing.assert_allclose(out, angles, atol=1e-3)


def test_rotate_composes_like_matrix():
    key = jax.random.PRNGKey(3)
    k1, k2 = jax.random.split(key)
    q = rand_quat(k1)
    v = jax.random.normal(k2, (3,))
    np.testing.assert_allclose(
        maths.rotate(v, q), maths.quat_to_3x3(q) @ v, atol=1e-5
    )


def test_safe_norm_zero_grad():
    g = jax.grad(lambda x: maths.safe_norm(x))(jnp.zeros(3))
    assert not jnp.any(jnp.isnan(g))
    assert float(maths.safe_norm(jnp.zeros(3))) == 0.0


def test_quat_rot_axis_matches_euler():
    q1 = maths.quat_rot_axis(jnp.array([0.0, 0.0, 1.0]), jnp.pi / 2)
    q2 = maths.euler_to_quat(jnp.array([0.0, 0.0, 90.0]))
    np.testing.assert_allclose(q1, q2, atol=1e-6)


def test_signed_angle():
    axis = jnp.array([0.0, 0.0, 1.0])
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    assert float(maths.signed_angle(axis, a, b)) == pytest.approx(np.pi / 2, abs=1e-6)
    assert float(maths.signed_angle(axis, b, a)) == pytest.approx(-np.pi / 2, abs=1e-6)
