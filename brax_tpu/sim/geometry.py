"""Closest-point / clipping / SAT geometry kernels for narrowphase collision.

All functions are written batched: they accept arrays with arbitrary leading
dimensions and operate on the trailing (3,) vector axis, so a whole
(pairs x contacts) grid is one fused VPU program — no per-scalar vmap.

Functional parity with /root/reference/brax/physics/geometry.py:360-914.
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu import maths
from brax_tpu.maths import dot1, vdot

Array = jax.Array

# Corner offsets of a unit box, in the same enumeration order as the
# reference (geometry.py:29): itertools.product((-1, 1), (-1, 1), (-1, 1)).
BOX_CORNERS = onp.array(list(itertools.product((-1, 1), (-1, 1), (-1, 1))), dtype=onp.float64)

# Triangulated box: vertex indices of 12 triangles (geometry.py:34-41).
TRIANGULATED_BOX_FACES = onp.array([
    0, 4, 1, 4, 1, 5,
    0, 4, 2, 2, 4, 6,
    6, 4, 5, 6, 5, 7,
    2, 6, 3, 3, 6, 7,
    1, 3, 5, 5, 3, 7,
    0, 2, 1, 1, 2, 3,
])
TRIANGULATED_BOX_FACE_NORMALS = onp.array([
    [0, -1.0, 0], [0, -1.0, 0],
    [0, 0, -1.0], [0, 0, -1.0],
    [1.0, 0, 0], [1.0, 0, 0],
    [0, 1.0, 0], [0, 1.0, 0],
    [0, 0, 1.0], [0, 0, 1.0],
    [-1.0, 0, 0], [-1.0, 0, 0],
])

# Quad box faces, clockwise winding (geometry.py:58-74).
BOX_FACES = onp.array([
    0, 1, 5, 4,
    0, 4, 6, 2,
    6, 4, 5, 7,
    2, 6, 7, 3,
    1, 3, 7, 5,
    0, 2, 3, 1,
])
BOX_FACE_NORMALS = onp.array([
    [0, -1.0, 0],
    [0, 0, -1.0],
    [1.0, 0, 0],
    [0, 1.0, 0],
    [0, 0, 1.0],
    [-1.0, 0, 0],
])


def closest_segment_point(a: Array, b: Array, pt: Array) -> Array:
    """Closest point on segment a-b to point pt (geometry.py:360-365)."""
    ab = b - a
    t = dot1(pt - a, ab) / (dot1(ab, ab) + 1e-6)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def closest_segment_point_and_dist(a: Array, b: Array, pt: Array):
    """Closest point and squared distance (geometry.py:368-374)."""
    p = closest_segment_point(a, b, pt)
    v = pt - p
    return p, vdot(v, v)


def closest_segment_point_plane(a: Array, b: Array, p0: Array, plane_normal: Array) -> Array:
    """Closest point between segment and plane (geometry.py:377-391)."""
    n = plane_normal
    d = dot1(p0, n)
    denom = dot1(n, b - a)
    t = (d - dot1(n, a)) / (denom + 1e-6)
    t = jnp.clip(t, 0, 1)
    return a + t * (b - a)


def _closest_segment_to_segment_points(a0, a1, b0, b1):
    """Closest points on two segments + barycentric vars (geometry.py:394-451)."""
    dir_a = a1 - a0
    len_a = maths.safe_norm(dir_a)[..., None]
    len_a += 1e-6 * (len_a == 0.0)
    dir_a = dir_a / len_a
    half_len_a = len_a * 0.5

    dir_b = b1 - b0
    len_b = maths.safe_norm(dir_b)[..., None]
    len_b += 1e-6 * (len_b == 0.0)
    dir_b = dir_b / len_b
    half_len_b = len_b * 0.5

    a_mid = a0 + dir_a * half_len_a
    b_mid = b0 + dir_b * half_len_b
    trans = a_mid - b_mid

    dira_dot_dirb = dot1(dir_a, dir_b)
    dira_dot_trans = dot1(dir_a, trans)
    dirb_dot_trans = dot1(dir_b, trans)
    denom = 1 - dira_dot_dirb * dira_dot_dirb

    orig_t_a = (-dira_dot_trans + dira_dot_dirb * dirb_dot_trans) / (denom + 1e-6)
    orig_t_b = dirb_dot_trans + orig_t_a * dira_dot_dirb
    t_a = jnp.clip(orig_t_a, -half_len_a, half_len_a)
    t_b = jnp.clip(orig_t_b, -half_len_b, half_len_b)

    best_a = a_mid + dir_a * t_a
    best_b = b_mid + dir_b * t_b

    new_a, d1 = closest_segment_point_and_dist(a0, a1, best_b)
    new_b, d2 = closest_segment_point_and_dist(b0, b1, best_a)
    d1, d2 = d1[..., None], d2[..., None]
    best_a = jnp.where(d1 < d2, new_a, best_a)
    best_b = jnp.where(d1 < d2, best_b, new_b)

    t_a = (orig_t_a + half_len_a) / len_a
    t_b = (orig_t_b + half_len_b) / len_b
    return best_a, best_b, t_a[..., 0], t_b[..., 0]


def closest_segment_to_segment_points(a0, a1, b0, b1):
    best_a, best_b, *_ = _closest_segment_to_segment_points(a0, a1, b0, b1)
    return best_a, best_b


def closest_triangle_point(p0, p1, p2, pt):
    """Closest point on triangle (p0,p1,p2) to pt (geometry.py:462-498)."""
    e0 = p1 - p0
    e1 = p2 - p0
    a = dot1(e0, e0)
    b = dot1(e0, e1)
    c = dot1(e1, e1)
    d = pt - p0
    det = a * c - b * b
    u = (c * dot1(e0, d) - b * dot1(e1, d)) / det
    v = (-b * dot1(e0, d) + a * dot1(e1, d)) / det
    inside = (0 <= u) & (u <= 1) & (0 <= v) & (v <= 1) & (u + v <= 1)
    closest_p = p0 + u * e0 + v * e1
    d0 = dot1(closest_p - pt, closest_p - pt)

    closest_p1, d1 = closest_segment_point_and_dist(p0, p1, pt)
    d1 = d1[..., None]
    closest_p = jnp.where((d0 < d1) & inside, closest_p, closest_p1)
    min_d = jnp.where((d0 < d1) & inside, d0, d1)

    closest_p2, d2 = closest_segment_point_and_dist(p1, p2, pt)
    d2 = d2[..., None]
    closest_p = jnp.where(d2 < min_d, closest_p2, closest_p)
    min_d = jnp.minimum(min_d, d2)

    closest_p3, d3 = closest_segment_point_and_dist(p2, p0, pt)
    d3 = d3[..., None]
    closest_p = jnp.where(d3 < min_d, closest_p3, closest_p)
    return closest_p


def closest_segment_triangle_points(a, b, p0, p1, p2, triangle_normal):
    """Closest points between segment and triangle (geometry.py:501-533)."""
    seg_pt1, tri_pt1 = closest_segment_to_segment_points(a, b, p0, p1)
    d1 = vdot(seg_pt1 - tri_pt1, seg_pt1 - tri_pt1)
    seg_pt2, tri_pt2 = closest_segment_to_segment_points(a, b, p1, p2)
    d2 = vdot(seg_pt2 - tri_pt2, seg_pt2 - tri_pt2)
    seg_pt3, tri_pt3 = closest_segment_to_segment_points(a, b, p0, p2)
    d3 = vdot(seg_pt3 - tri_pt3, seg_pt3 - tri_pt3)

    seg_pt4 = closest_segment_point_plane(a, b, p0, triangle_normal)
    tri_pt4 = closest_triangle_point(p0, p1, p2, seg_pt4)
    d4 = vdot(seg_pt4 - tri_pt4, seg_pt4 - tri_pt4)

    distance = jnp.stack([d1, d2, d3, d4], axis=-1)  # (..., 4)
    min_dist = jnp.min(distance, axis=-1, keepdims=True)
    mask = (distance == min_dist)[..., None]  # (..., 4, 1)
    seg_pt = jnp.stack([seg_pt1, seg_pt2, seg_pt3, seg_pt4], axis=-2) * mask
    tri_pt = jnp.stack([tri_pt1, tri_pt2, tri_pt3, tri_pt4], axis=-2) * mask
    denom = jnp.sum(mask, axis=(-2, -1), keepdims=False)[..., None]
    seg_pt = jnp.sum(seg_pt, axis=-2) / denom
    tri_pt = jnp.sum(tri_pt, axis=-2) / denom
    return seg_pt, tri_pt


def project_pt_onto_plane(pt, plane_pt, plane_normal):
    dist = dot1(pt - plane_pt, plane_normal)
    return pt - dist * plane_normal


def project_poly_onto_plane(poly, plane_pt, plane_normal):
    """poly (..., k, 3) onto plane (geometry.py:543-549)."""
    n = maths.normalize(plane_normal)
    return project_pt_onto_plane(poly, plane_pt[..., None, :], n[..., None, :])


def project_poly_onto_poly_plane(poly1, norm1, poly2, norm2):
    """Projects poly1 along norm1 onto poly2's plane (geometry.py:552-560)."""
    d = dot1(poly2[..., 0, :], norm2)[..., None]
    denom = dot1(poly1, norm2[..., None, :]) * 0 + vdot(norm1, norm2)[..., None, None]
    denom = vdot(norm1, norm2)[..., None, None]
    t = (d[..., None, 0] - dot1(poly1, norm2[..., None, :])) / (denom + 1e-6 * (denom == 0.0))
    return poly1 + t * norm1[..., None, :]


def point_in_front_of_plane(plane_pt, plane_normal, pt):
    return vdot(pt - plane_pt, plane_normal) > 1e-6


def get_orthogonals(a):
    """Orthogonal basis vectors b, c for normal a (geometry.py:568-577)."""
    a_abs = jnp.abs(a)
    idx = jnp.argmax(a_abs, axis=-1)
    oh = jax.nn.one_hot(idx, 3, dtype=a.dtype)
    a_at = jnp.sum(a * oh, axis=-1, keepdims=True)
    denom = a_at + 1e-6 * (a_at == 0.0)
    val = -(jnp.sum(a, axis=-1, keepdims=True) - a_at) / denom
    b = jnp.ones_like(a) * (1 - oh) + oh * val
    c = jnp.cross(a, b)
    return b, c
