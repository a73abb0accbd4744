"""Batched quaternion / rotation algebra.

All functions broadcast over arbitrary leading batch dimensions: a vector is
`(..., 3)`, a quaternion is `(..., 4)` in (w, x, y, z) order.  This replaces
per-scalar `vmap` composition with direct vector code, which traces faster and
lowers to identical XLA.

Functional parity with the reference quaternion library
(/root/reference/brax/math.py:25-209 and brax/jumpy.py:170-341 safe ops).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def vdot(a: Array, b: Array) -> Array:
    """Dot product over the last axis (no keepdims)."""
    return jnp.sum(a * b, axis=-1)


def dot1(a: Array, b: Array) -> Array:
    """Dot product over the last axis, keepdims for broadcasting."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: Array, b: Array) -> Array:
    return jnp.cross(a, b)


def norm(x: Array, axis=None) -> Array:
    return jnp.linalg.norm(x, axis=axis)


def safe_norm(x: Array, axis: int = -1) -> Array:
    """norm(x) with a well-defined 0 gradient at x == 0.

    Per-row equivalent of the reference safe_norm (brax/jumpy.py:170-193,
    which checks `allclose(x, 0)` on the full per-call array; here each
    row along `axis` is its own call).
    """
    is_zero = jnp.all(jnp.abs(x) <= 1e-8, axis=axis, keepdims=True)
    xsafe = jnp.where(is_zero, jnp.ones_like(x), x)
    n = jnp.linalg.norm(xsafe, axis=axis)
    return jnp.where(jnp.squeeze(is_zero, axis=axis), 0.0, n)


@jax.custom_jvp
def safe_arccos(x: Array) -> Array:
    """arccos with clipped gradient (brax/jumpy.py:313-326)."""
    return jnp.arccos(x)


@safe_arccos.defjvp
def _safe_arccos_jvp(primals, tangents):
    (x,) = primals
    (x_dot,) = tangents
    primal_out = safe_arccos(x)
    tangent_out = -x_dot / jnp.sqrt(1.0 - jnp.clip(x, -1 + 1e-7, 1 - 1e-7) ** 2.0)
    return primal_out, tangent_out


@jax.custom_jvp
def safe_arcsin(x: Array) -> Array:
    """arcsin with clipped gradient (brax/jumpy.py:334-347)."""
    return jnp.arcsin(x)


@safe_arcsin.defjvp
def _safe_arcsin_jvp(primals, tangents):
    (x,) = primals
    (x_dot,) = tangents
    primal_out = safe_arcsin(x)
    tangent_out = x_dot / jnp.sqrt(1.0 - jnp.clip(x, -1 + 1e-7, 1 - 1e-7) ** 2.0)
    return primal_out, tangent_out


def rotate(vec: Array, quat: Array) -> Array:
    """Rotates vec (..., 3) by unit quaternion quat (..., 4).

    Parity: brax/math.py:25-40.
    """
    s = quat[..., 0:1]
    u = quat[..., 1:]
    r = 2 * (dot1(u, vec) * u) + (s * s - dot1(u, u)) * vec
    return r + 2 * s * jnp.cross(u, vec)


def inv_rotate(vec: Array, quat: Array) -> Array:
    """Rotates vec by quat^-1 (brax/math.py:43-53)."""
    return rotate(vec, quat_inv(quat))


def ang_to_quat(ang: Array) -> Array:
    """Angular velocity (..., 3) -> quaternion with zero w (brax/math.py:56-65)."""
    return jnp.concatenate([jnp.zeros_like(ang[..., :1]), ang], axis=-1)


def euler_to_quat(v: Array) -> Array:
    """Euler degrees (Tait-Bryan intrinsic x-y'-z'') -> quaternion.

    Parity: brax/math.py:68-77.
    """
    v = jnp.asarray(v)
    c = jnp.cos(v * jnp.pi / 360)
    s = jnp.sin(v * jnp.pi / 360)
    c1, c2, c3 = c[..., 0], c[..., 1], c[..., 2]
    s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2]
    w = c1 * c2 * c3 - s1 * s2 * s3
    x = s1 * c2 * c3 + c1 * s2 * s3
    y = c1 * s2 * c3 - s1 * c2 * s3
    z = c1 * c2 * s3 + s1 * s2 * c3
    return jnp.stack([w, x, y, z], axis=-1)


def _arctan_poly(t: Array) -> Array:
    """arctan via odd minimax polynomial (|err| ~ 1e-7 on [-1, 1]); Mosaic
    has no atan primitive.  |t| > 1 reduces with atan(t) = pi/2 - atan(1/t)."""
    big = jnp.abs(t) > 1.0
    tt = jnp.where(big, 1.0 / jnp.where(t == 0, 1.0, t), t)
    z = tt * tt
    p = jnp.float32(-0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * z + jnp.float32(c)
    r = tt * p
    half_pi = jnp.float32(jnp.pi / 2)
    return jnp.where(big, jnp.sign(t) * half_pi - r, r)


def arctan2(y: Array, x: Array) -> Array:
    """jnp.arctan2, with an arctan-based lowering for Pallas kernels.

    Mosaic implements atan but not atan2; inside kernel tracing
    (sim.lowering.kernel_mode) reconstruct the quadrant explicitly."""
    from brax_tpu.sim import lowering

    if not lowering.in_kernel_mode():
        return jnp.arctan2(y, x)
    safe_x = jnp.where(x == 0, 1.0, x)
    base = _arctan_poly(y / safe_x)
    pi = jnp.float32(jnp.pi)
    out = jnp.where(x > 0, base, base)
    out = jnp.where((x < 0) & (y >= 0), base + pi, out)
    out = jnp.where((x < 0) & (y < 0), base - pi, out)
    out = jnp.where((x == 0) & (y > 0), pi / 2, out)
    out = jnp.where((x == 0) & (y < 0), -pi / 2, out)
    out = jnp.where((x == 0) & (y == 0), 0.0, out)
    return out


def quat_to_euler(q: Array) -> Array:
    """Quaternion -> intrinsic x-y'-z'' Euler radians (brax/math.py:80-91)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ez = arctan2(-2 * x * y + 2 * w * z, x * x + w * w - z * z - y * y)
    ey = safe_arcsin(jnp.clip(2 * x * z + 2 * w * y, -1.0, 1.0))
    ex = arctan2(-2 * y * z + 2 * w * x, z * z - y * y - x * x + w * w)
    return jnp.stack([ex, ey, ez], axis=-1)


def quat_to_axis_angle(q: Array):
    """Axis-angle of a quaternion; angle in [-pi, pi] (brax/math.py:94-113)."""
    epsilon = 1e-10
    denom = safe_norm(q[..., 1:])
    angle = 2.0 * arctan2(
        jnp.sqrt(epsilon + q[..., 1] ** 2 + q[..., 2] ** 2 + q[..., 3] ** 2),
        q[..., 0],
    )
    angle += jnp.where(angle > jnp.pi, -2 * jnp.pi, 0.0)
    angle += jnp.where(angle < -jnp.pi, 2 * jnp.pi, 0.0)
    scale = jnp.where(denom == 0.0, 0.0, 1.0 / denom)
    return q[..., 1:] * scale[..., None], angle


def signed_angle(axis: Array, ref_p: Array, ref_c: Array) -> Array:
    """Signed angle between two vectors around an axis (brax/math.py:116-127)."""
    return arctan2(vdot(jnp.cross(ref_p, ref_c), axis), vdot(ref_p, ref_c))


def quat_mul(u: Array, v: Array) -> Array:
    """Quaternion product u * v (brax/math.py:130-145)."""
    w = u[..., 0] * v[..., 0] - u[..., 1] * v[..., 1] - u[..., 2] * v[..., 2] - u[..., 3] * v[..., 3]
    x = u[..., 0] * v[..., 1] + u[..., 1] * v[..., 0] + u[..., 2] * v[..., 3] - u[..., 3] * v[..., 2]
    y = u[..., 0] * v[..., 2] - u[..., 1] * v[..., 3] + u[..., 2] * v[..., 0] + u[..., 3] * v[..., 1]
    z = u[..., 0] * v[..., 3] + u[..., 1] * v[..., 2] - u[..., 2] * v[..., 1] + u[..., 3] * v[..., 0]
    return jnp.stack([w, x, y, z], axis=-1)


def vec_quat_mul(u: Array, v: Array) -> Array:
    """(0, u) * v quaternion product for a 3-vector u (brax/math.py:148-170)."""
    w = -u[..., 0] * v[..., 1] - u[..., 1] * v[..., 2] - u[..., 2] * v[..., 3]
    x = u[..., 0] * v[..., 0] + u[..., 1] * v[..., 3] - u[..., 2] * v[..., 2]
    y = -u[..., 0] * v[..., 3] + u[..., 1] * v[..., 0] + u[..., 2] * v[..., 1]
    z = u[..., 0] * v[..., 2] - u[..., 1] * v[..., 1] + u[..., 2] * v[..., 0]
    return jnp.stack([w, x, y, z], axis=-1)


def quat_rot_axis(axis: Array, angle: Array) -> Array:
    """Quaternion rotating by angle around axis (brax/math.py:173-187)."""
    angle = jnp.asarray(angle)
    s = jnp.sin(angle / 2)[..., None]
    qw = jnp.cos(angle / 2)[..., None]
    return jnp.concatenate([qw, axis * s], axis=-1)


def quat_inv(q: Array) -> Array:
    """Inverse (conjugate) of a unit quaternion (brax/math.py:190-199)."""
    return q * jnp.array([1.0, -1.0, -1.0, -1.0])


def relative_quat(q1: Array, q2: Array) -> Array:
    """Relative quaternion from q1 to q2 (brax/math.py:202-204)."""
    return quat_mul(q2, quat_inv(q1))


def normalize(v: Array, epsilon: float = 1e-6) -> Array:
    """Normalizes a vector (brax/math.py:207-209)."""
    return v / (epsilon + safe_norm(v)[..., None])


def normalize_with_norm(x: Array, axis: int = -1):
    """Returns (x normalized, norm), zero-safe (reference v2/math.py:306-322).

    The epsilon is only added where the norm is exactly zero, so unit vectors
    pass through bit-exact.
    """
    n = safe_norm(x, axis=axis)
    normed = x / jnp.expand_dims(n + 1e-6 * (n == 0.0), axis)
    return normed, n


def from_to(v1: Array, v2: Array) -> Array:
    """Quaternion rotating unit vector v1 onto unit vector v2.

    Parity: reference brax/v2/math.py:323-336, broadcast over leading axes.
    """
    w = 1.0 + vdot(v1, v2)[..., None]
    rot = jnp.concatenate([w, jnp.cross(v1, v2)], axis=-1)
    # antiparallel fallback: rotate pi about any axis orthogonal to v1
    x = jnp.array([1.0, 0.0, 0.0])
    y = jnp.array([0.0, 1.0, 0.0])
    near_x = (jnp.abs(vdot(v1, jnp.broadcast_to(x, v1.shape))) > 0.99)[..., None]
    rot_axis = jnp.where(near_x, jnp.cross(v1, y), jnp.cross(v1, x))
    flip = quat_rot_axis(rot_axis, jnp.full(v1.shape[:-1], jnp.pi))
    rot = jnp.where(rot[..., 0:1] < 1e-6, flip, rot)
    return rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)


def quat_from_3x3(m: Array) -> Array:
    """Rotation matrix (..., 3, 3) -> quaternion (reference v2/math.py:119-126)."""
    w = jnp.sqrt(1 + m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]) / 2.0
    x = (m[..., 2, 1] - m[..., 1, 2]) / (w * 4)
    y = (m[..., 0, 2] - m[..., 2, 0]) / (w * 4)
    z = (m[..., 1, 0] - m[..., 0, 1]) / (w * 4)
    return jnp.stack([w, x, y, z], axis=-1)


def inv_3x3(m: Array) -> Array:
    """Adjugate-based 3x3 inverse, batched (reference v2/math.py:184-204)."""
    det = jnp.linalg.det(m)
    c = lambda i, j, k, l: m[..., i, j] * m[..., k, l]
    adj = jnp.stack(
        [
            jnp.stack(
                [
                    c(1, 1, 2, 2) - c(1, 2, 2, 1),
                    c(0, 2, 2, 1) - c(0, 1, 2, 2),
                    c(0, 1, 1, 2) - c(0, 2, 1, 1),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c(1, 2, 2, 0) - c(1, 0, 2, 2),
                    c(0, 0, 2, 2) - c(0, 2, 2, 0),
                    c(0, 2, 1, 0) - c(0, 0, 1, 2),
                ],
                axis=-1,
            ),
            jnp.stack(
                [
                    c(1, 0, 2, 1) - c(1, 1, 2, 0),
                    c(0, 1, 2, 0) - c(0, 0, 2, 1),
                    c(0, 0, 1, 1) - c(0, 1, 1, 0),
                ],
                axis=-1,
            ),
        ],
        axis=-2,
    )
    return adj / (det[..., None, None] + 1e-10)


def orthogonals(n: Array):
    """Two orthogonal in-plane vectors for plane normal n (v2/math.py:207-222)."""
    n_sqr = n[..., 2] * n[..., 2]
    a = n[..., 1] * n[..., 1] + jnp.where(n_sqr > 0.5, n_sqr, n[..., 0] * n[..., 0])
    k = jnp.sqrt(a)
    zero = jnp.zeros_like(k)
    p_gt = jnp.stack([zero, -n[..., 2], n[..., 1]], axis=-1)
    p_lt = jnp.stack([-n[..., 1], n[..., 0], n[..., 1]], axis=-1)
    p = jnp.where((a > 0.5)[..., None], p_gt, p_lt) * k[..., None]
    q_gt = jnp.stack([a * k, -n[..., 0] * p[..., 2], n[..., 0] * p[..., 1]], axis=-1)
    q_lt = jnp.stack([-n[..., 2] * p[..., 1], n[..., 2] * p[..., 0], a * k], axis=-1)
    q = jnp.where((a > 0.5)[..., None], q_gt, q_lt)
    return p, q


def inv_approximate(
    a: Array, a_inv: Array, tol: float = 1e-12, maxiter: int = 10
) -> Array:
    """Newton-Schulz iterative matrix inverse (reference v2/math.py:247-280).

    Warm-started from a_inv (e.g. last step's inverse); falls back to a safe
    scaled-transpose start when the residual is too large to converge.
    """

    def body_fn(carry, _):
        cur, err = carry
        nxt = 2 * cur - cur @ a.T @ cur
        nxt_err = jnp.linalg.norm(nxt - cur)
        # freeze once converged; fixed trip count keeps reverse-mode autodiff
        # working (lax.while_loop is not reverse-differentiable)
        cur = jnp.where(err > tol, nxt, cur)
        err = jnp.where(err > tol, nxt_err, err)
        return (cur, err), None

    r0 = jnp.eye(a.shape[-1]) - a @ a_inv
    a_inv = jnp.where(jnp.linalg.norm(r0) > 1, 0.5 * a.T / jnp.trace(a @ a.T), a_inv)
    (a_inv, _), _ = jax.lax.scan(body_fn, (a_inv, jnp.ones(())), None, length=maxiter)
    return a_inv


def quat_to_3x3(q: Array) -> Array:
    """Quaternion -> rotation matrix (..., 3, 3)."""
    d = vdot(q, q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    s = 2.0 / d
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    rows = [
        jnp.stack([1 - (yy + zz), xy - wz, xz + wy], axis=-1),
        jnp.stack([xy + wz, 1 - (xx + zz), yz - wx], axis=-1),
        jnp.stack([xz - wy, yz + wx, 1 - (xx + yy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def physics_precision(fn):
    """Wraps a physics entry point in jax.default_matmul_precision('highest').

    On this jax build, DEFAULT matmul precision silently degrades f32
    contractions to bf16 inputs EVEN ON CPU (measured: humanoid mass
    matrix M[0,0] = 42.0 under an f32 (23,6)@(6,23) matmul whose exact
    value is 42.116028 = the total mass; numpy agrees with the exact
    value).  That is acceptable for the trainer MLPs (2x faster, RL-noise
    scale) but wrong for physics: the v2 generalized pipeline's mass
    matrix, NNLS solve, and contact math all run through tiny matmuls
    where the ~0.3%% bf16 input rounding turns into qd errors 4-14x above
    the true platform noise floor (HW_r05/diag_gen_kernel_humanoid.log
    pre-fix).  The fused Pallas kernels always did these contractions in
    f32 and were MORE accurate than the jnp path — this restores parity.
    The context is a trace-time setting: everything traced inside the
    entry point (kinematics, geometry, constraint solve) is covered, and
    the trainers' own matmuls outside it keep the fast default."""
    import functools as _ft

    @_ft.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
