"""Closest-point queries, polygon clipping, and the separating-axis test.

Functional parity with reference brax/v2/geometry/math.py.  These routines
run per contact pair under vmap from the contact dispatcher; they are written
single-pair for clarity and batch via vmap, which XLA fuses into the same
vectorized program as hand-batched code.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2.base import Contact

Array = jax.Array


def closest_segment_point(a: Array, b: Array, pt: Array) -> Array:
    """Point on segment [a, b] closest to pt."""
    ab = b - a
    t = jnp.dot(pt - a, ab) / (jnp.dot(ab, ab) + 1e-6)
    return a + jnp.clip(t, 0.0, 1.0) * ab


def closest_segment_point_and_dist(a: Array, b: Array, pt: Array):
    """Closest point on [a, b] to pt, plus squared distance."""
    p = closest_segment_point(a, b, pt)
    return p, jnp.dot(pt - p, pt - p)


def closest_segment_to_segment_points(
    a0: Array, a1: Array, b0: Array, b1: Array
) -> Tuple[Array, Array]:
    """Closest points on two segments.

    Solves the unconstrained two-line problem analytically, clips to the
    segments, then repairs the clipped solution by re-projecting each
    endpoint (handles crossing-lines / parallel edge cases).
    """
    dir_a, len_a = maths.normalize_with_norm(a1 - a0)
    dir_b, len_b = maths.normalize_with_norm(b1 - b0)
    half_a, half_b = len_a * 0.5, len_b * 0.5
    a_mid = a0 + dir_a * half_a
    b_mid = b0 + dir_b * half_b
    trans = a_mid - b_mid

    dab = jnp.dot(dir_a, dir_b)
    dat = jnp.dot(dir_a, trans)
    dbt = jnp.dot(dir_b, trans)
    denom = 1.0 - dab * dab

    t_a = jnp.clip((-dat + dab * dbt) / (denom + 1e-6), -half_a, half_a)
    t_b = jnp.clip(dbt + t_a * dab, -half_b, half_b)
    best_a = a_mid + dir_a * t_a
    best_b = b_mid + dir_b * t_b

    new_a, d1 = closest_segment_point_and_dist(a0, a1, best_b)
    new_b, d2 = closest_segment_point_and_dist(b0, b1, best_a)
    best_a = jnp.where(d1 < d2, new_a, best_a)
    best_b = jnp.where(d1 < d2, best_b, new_b)
    return best_a, best_b


def closest_segment_point_plane(
    a: Array, b: Array, p0: Array, plane_normal: Array
) -> Array:
    """Point on segment [a, b] closest to the plane (p0, n)."""
    n = plane_normal
    d = jnp.sum(p0 * n)
    denom = jnp.sum(n * (b - a))
    t = (d - jnp.sum(n * a)) / (denom + 1e-6 * (denom == 0.0))
    return a + jnp.clip(t, 0.0, 1.0) * (b - a)


def closest_triangle_point(p0: Array, p1: Array, p2: Array, pt: Array) -> Array:
    """Point on triangle (p0, p1, p2) closest to pt.

    Interior solution from the barycentric normal equations; otherwise the
    nearest of the three edge projections.
    """
    e0, e1 = p1 - p0, p2 - p0
    a = jnp.dot(e0, e0)
    b = jnp.dot(e0, e1)
    c = jnp.dot(e1, e1)
    d = pt - p0
    det = a * c - b * b
    u = (c * jnp.dot(e0, d) - b * jnp.dot(e1, d)) / det
    v = (-b * jnp.dot(e0, d) + a * jnp.dot(e1, d)) / det
    inside = (u >= 0) & (u <= 1) & (v >= 0) & (v <= 1) & (u + v <= 1)
    p_in = p0 + u * e0 + v * e1
    d0 = jnp.dot(p_in - pt, p_in - pt)

    p_e1, d1 = closest_segment_point_and_dist(p0, p1, pt)
    best = jnp.where((d0 < d1) & inside, p_in, p_e1)
    min_d = jnp.where((d0 < d1) & inside, d0, d1)
    p_e2, d2 = closest_segment_point_and_dist(p1, p2, pt)
    best = jnp.where(d2 < min_d, p_e2, best)
    min_d = jnp.minimum(min_d, d2)
    p_e3, d3 = closest_segment_point_and_dist(p2, p0, pt)
    return jnp.where(d3 < min_d, p_e3, best)


def closest_segment_triangle_points(
    a: Array, b: Array, p0: Array, p1: Array, p2: Array, triangle_normal: Array
) -> Tuple[Array, Array]:
    """Closest points between a segment and a triangle.

    Tests the three edges plus the interior (via the plane projection) and
    averages the minimum-distance candidates.
    """
    s1, t1 = closest_segment_to_segment_points(a, b, p0, p1)
    s2, t2 = closest_segment_to_segment_points(a, b, p1, p2)
    s3, t3 = closest_segment_to_segment_points(a, b, p0, p2)
    s4 = closest_segment_point_plane(a, b, p0, triangle_normal)
    t4 = closest_triangle_point(p0, p1, p2, s4)

    seg = jnp.stack([s1, s2, s3, s4])
    tri = jnp.stack([t1, t2, t3, t4])
    dist = jnp.sum((seg - tri) ** 2, axis=-1)
    mask = (dist == dist.min())[:, None]
    seg_pt = jnp.sum(seg * mask, axis=0) / jnp.sum(mask)
    tri_pt = jnp.sum(tri * mask, axis=0) / jnp.sum(mask)
    return seg_pt, tri_pt


# ---------------------------------------------------------------------------
# convex polygon clipping + manifold selection (SAT support)
# ---------------------------------------------------------------------------


def _project_pt_onto_plane(pt: Array, plane_pt: Array, normal: Array) -> Array:
    return pt - jnp.dot(pt - plane_pt, normal) * normal


def _project_poly_onto_plane(poly: Array, plane_pt: Array, normal: Array) -> Array:
    n, _ = maths.normalize_with_norm(normal)
    return poly - ((poly - plane_pt) @ n)[:, None] * n


def _project_poly_onto_poly_plane(
    poly1: Array, norm1: Array, poly2: Array, norm2: Array
) -> Array:
    """Projects poly1 onto poly2's plane along poly1's normal."""
    d = jnp.dot(poly2[0], norm2)
    denom = jnp.dot(norm1, norm2)
    t = (d - poly1 @ norm2) / (denom + 1e-6 * (denom == 0.0))
    return poly1 + t[:, None] * norm1


def point_in_front_of_plane(plane_pt: Array, normal: Array, pt: Array) -> Array:
    return jnp.dot(pt - plane_pt, normal) > 1e-6


def _clip_edge_to_planes(
    edge_p0: Array, edge_p1: Array, plane_pts: Array, plane_normals: Array
) -> Tuple[Array, Array]:
    """Clips one edge against a set of side planes.

    Returns the two clipped endpoints and a validity mask (False if the edge
    lies entirely in front of any clipping plane, or the clip crossed over).
    """
    p0, p1 = edge_p0, edge_p1
    p0_front = jnp.einsum("ij,ij->i", p0 - plane_pts, plane_normals) > 1e-6
    p1_front = jnp.einsum("ij,ij->i", p1 - plane_pts, plane_normals) > 1e-6

    candidates = jax.vmap(closest_segment_point_plane, in_axes=(None, None, 0, 0))(
        p0, p1, plane_pts, plane_normals
    )

    def clip_endpoint(p0, p1, p0_front, candidates):
        picked = jnp.where(p0_front[:, None], candidates, p0)
        dists = (picked - p0) @ (p1 - p0)
        return picked[jnp.argmax(dists)]

    new_p0 = clip_endpoint(p0, p1, p0_front, candidates)
    new_p1 = clip_endpoint(p1, p0, p1_front, candidates)
    clipped = jnp.stack([new_p0, new_p1])

    both_front = p0_front & p1_front
    mask = ~jnp.any(both_front)
    new_ps = jnp.where(mask, clipped, jnp.stack([p0, p1]))
    mask = jnp.where(jnp.dot(p0 - p1, new_ps[0] - new_ps[1]) < 0, False, mask)
    return new_ps, jnp.stack([mask, mask])


def clip(
    clipping_poly: Array,
    subject_poly: Array,
    clipping_normal: Array,
    subject_normal: Array,
) -> Tuple[Array, Array]:
    """Clips the subject polygon against the clipping polygon (both convex).

    Parallel Sutherland-Hodgman variant: all subject edges are clipped against
    the clipping side-planes at once, and the clipping polygon's own edges
    (projected into the subject plane) are clipped against the subject's side
    planes to recover containment cases.
    """
    clip_p0 = jnp.roll(clipping_poly, 1, axis=0)
    clip_p1 = clipping_poly
    clip_plane_n = jnp.cross(clip_p1 - clip_p0, clipping_normal)

    subj_p0 = jnp.roll(subject_poly, 1, axis=0)
    subj_p1 = subject_poly
    subj_plane_n = jnp.cross(subj_p1 - subj_p0, subject_normal)

    edges0, masks0 = jax.vmap(_clip_edge_to_planes, in_axes=(0, 0, None, None))(
        subj_p0, subj_p1, clip_p0, clip_plane_n
    )

    clip_p0_s = _project_poly_onto_poly_plane(
        clip_p0, clipping_normal, subject_poly, subject_normal
    )
    clip_p1_s = _project_poly_onto_poly_plane(
        clip_p1, clipping_normal, subject_poly, subject_normal
    )
    edges1, masks1 = jax.vmap(_clip_edge_to_planes, in_axes=(0, 0, None, None))(
        clip_p0_s, clip_p1_s, subj_p0, subj_plane_n
    )

    points = jnp.concatenate([edges0, edges1]).reshape((-1, 3))
    mask = jnp.concatenate([masks0, masks1]).reshape(-1)
    return points, mask


def manifold_points(poly: Array, poly_mask: Array, poly_norm: Array) -> Array:
    """Picks four point indices spanning maximal area within a clipped polygon."""
    dist_mask = jnp.where(poly_mask, 0.0, -1e6)
    a_idx = jnp.argmax(dist_mask)
    a = poly[a_idx]
    b_idx = (((a - poly) ** 2).sum(axis=1) + dist_mask).argmax()
    b = poly[b_idx]
    qa, qb = poly - a, poly - b
    area_0 = jnp.cross(qa, qb) @ poly_norm
    c_idx = jnp.argmax(area_0 + dist_mask)
    c = poly[c_idx]
    qc = poly - c
    area_1 = jnp.cross(qb, qc) @ poly_norm
    area_2 = jnp.cross(qc, qa) @ poly_norm
    min_area = (jnp.stack([area_0, area_1, area_2]) - dist_mask).min(axis=0)
    d_idx = jnp.argmin(min_area)
    return jnp.stack([a_idx, b_idx, c_idx, d_idx])


def _create_contact_manifold(
    clipping_poly: Array,
    subject_poly: Array,
    clipping_norm: Array,
    subject_norm: Array,
    sep_axis: Array,
) -> Contact:
    """Clips the incident face onto the reference face and picks 4 points.

    Faces use CCW winding so side-plane normals point outward.  Invalid points
    get penetration -1.
    """
    poly_incident, mask = clip(
        clipping_poly, subject_poly, clipping_norm, subject_norm
    )
    poly_ref = _project_poly_onto_plane(poly_incident, clipping_poly[0], clipping_norm)
    behind = jax.vmap(point_in_front_of_plane, in_axes=(None, None, 0))(
        clipping_poly[0], -clipping_norm, poly_incident
    )
    mask = mask & behind

    best = manifold_points(poly_ref, mask, clipping_norm)
    pts = jnp.take(poly_ref, best, axis=0)
    mask_pts = jnp.take(mask, best, axis=0)
    pen_dir = jnp.take(poly_incident, best, axis=0) - pts
    penetration = pen_dir @ -clipping_norm
    penetration = jnp.where(mask_pts, penetration, -jnp.ones_like(penetration))

    return Contact(
        pos=pts,
        normal=jnp.tile(sep_axis, (4, 1)),
        penetration=penetration,
        friction=jnp.array([]),
        elasticity=jnp.array([]),
        link_idx=jnp.array([]),
    )


def sat_hull_hull(
    faces_a: Array,
    faces_b: Array,
    vertices_a: Array,
    vertices_b: Array,
    normals_a: Array,
    normals_b: Array,
    unique_edges_a: Array,
    unique_edges_b: Array,
) -> Contact:
    """Separating-axis test for two convex hulls; returns a 4-point manifold.

    Candidate axes are both hulls' face normals plus all unique-edge cross
    products; the minimum-overlap axis wins.  Face contacts clip a manifold;
    edge contacts keep the single deepest clipped point.
    """
    edge_dir_a = unique_edges_a[:, 0] - unique_edges_a[:, 1]
    edge_dir_b = unique_edges_b[:, 0] - unique_edges_b[:, 1]
    ee = jnp.cross(edge_dir_a[None, :, :], edge_dir_b[:, None, :]).reshape((-1, 3))
    ee, _ = maths.normalize_with_norm(ee)

    axes = jnp.concatenate([normals_a, normals_b, ee])

    support_a = axes @ vertices_a.T  # (n_axes, n_vert_a)
    support_b = axes @ vertices_b.T
    dist1 = support_a.max(axis=1) - support_b.min(axis=1)
    dist2 = support_b.max(axis=1) - support_a.min(axis=1)
    sign = jnp.where(dist1 > dist2, -1, 1)
    dist = jnp.minimum(dist1, dist2)
    dist = jnp.where(~jnp.all(axes == 0.0, axis=1), dist, 1e6)  # degenerate

    best_idx = jnp.argmin(dist)
    best_sign = sign[best_idx]
    best_axis = axes[best_idx]
    is_edge_contact = best_idx >= (normals_a.shape[0] + normals_b.shape[0])

    align_a = normals_a @ best_axis
    align_b = normals_b @ best_axis
    a_max, b_max = align_a.argmax(), align_b.argmax()
    a_min, b_min = align_a.argmin(), align_b.argmin()

    ref_face = jnp.where(best_sign > 0, faces_a[a_max], faces_b[b_max])
    ref_norm = jnp.where(best_sign > 0, normals_a[a_max], normals_b[b_max])
    inc_face = jnp.where(best_sign > 0, faces_b[b_min], faces_a[a_min])
    inc_norm = jnp.where(best_sign > 0, normals_b[b_min], normals_a[a_min])

    c = _create_contact_manifold(
        ref_face, inc_face, ref_norm, inc_norm, -best_sign * best_axis
    )

    # edge contact: keep only the deepest clipped point
    idx = c.penetration.argmax()
    c = c.replace(
        penetration=jnp.where(
            is_edge_contact,
            jnp.stack([c.penetration[idx], -1.0, -1.0, -1.0]),
            c.penetration,
        ),
        pos=jnp.where(is_edge_contact, jnp.tile(c.pos[idx], (4, 1)), c.pos),
    )
    return c
