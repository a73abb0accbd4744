"""Typed-pair contact dispatch for the v2 engine.

Parity with reference brax/v2/geometry/contact.py: sys.contacts holds
statically-stacked (geom_a, geom_b) pairs; each pair type has a narrowphase
function vmapped across its stack.  All shapes are static, so the whole
narrowphase is one fused XLA program per pair type.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple, TypeVar

import jax
import jax.numpy as jnp
from jax.tree_util import tree_map

from brax_tpu import maths
from brax_tpu.v2.base import (
    Box,
    Capsule,
    Contact,
    Convex,
    Geometry,
    Mesh,
    Plane,
    Sphere,
    System,
    Transform,
)
from brax_tpu.v2.geometry import math as geom_math
from brax_tpu.v2.geometry import mesh as geom_mesh

Geom = TypeVar("Geom", bound=Geometry)


def _combine(geom_a: Geometry, geom_b: Geometry):
    friction = jnp.maximum(geom_a.friction, geom_b.friction)
    elasticity = jnp.maximum(geom_a.elasticity, geom_b.elasticity)
    link_idx = (
        geom_a.link_idx,
        geom_b.link_idx if geom_b.link_idx is not None else -1,
    )
    return friction, elasticity, link_idx


def _one(c: Contact) -> Contact:
    """Adds a manifold axis of size 1."""
    return tree_map(lambda x: jnp.expand_dims(x, axis=0), c)


def _sphere_plane(sphere: Sphere, plane: Plane) -> Contact:
    n = maths.rotate(jnp.array([0.0, 0.0, 1.0]), plane.transform.rot)
    t = jnp.dot(sphere.transform.pos - plane.transform.pos, n)
    penetration = sphere.radius - t
    pos = sphere.transform.pos - n * (sphere.radius - 0.5 * penetration)
    return _one(Contact(pos, n, penetration, *_combine(sphere, plane)))


def _sphere_sphere(s_a: Sphere, s_b: Sphere) -> Contact:
    n, dist = maths.normalize_with_norm(s_a.transform.pos - s_b.transform.pos)
    penetration = s_a.radius + s_b.radius - dist
    pos = (
        (s_a.transform.pos - n * s_a.radius) + (s_b.transform.pos + n * s_b.radius)
    ) * 0.5
    return _one(Contact(pos, n, penetration, *_combine(s_a, s_b)))


def _sphere_capsule(sphere: Sphere, capsule: Capsule) -> Contact:
    segment = maths.rotate(
        jnp.array([0.0, 0.0, 1.0]) * capsule.length * 0.5, capsule.transform.rot
    )
    pt = geom_math.closest_segment_point(
        capsule.transform.pos - segment,
        capsule.transform.pos + segment,
        sphere.transform.pos,
    )
    n, dist = maths.normalize_with_norm(sphere.transform.pos - pt)
    penetration = sphere.radius + capsule.radius - dist
    pos = ((sphere.transform.pos - n * sphere.radius) + (pt + n * capsule.radius)) * 0.5
    return _one(Contact(pos, n, penetration, *_combine(sphere, capsule)))


def _sphere_mesh(sphere: Sphere, mesh: Mesh) -> Contact:
    """One contact per mesh triangle."""

    @jax.vmap
    def sphere_face(face):
        pt = mesh.transform.pos + maths.rotate(face, mesh.transform.rot[None])
        p0, p1, p2 = pt[0], pt[1], pt[2]
        tri_p = geom_math.closest_triangle_point(p0, p1, p2, sphere.transform.pos)
        n, dist = maths.normalize_with_norm(sphere.transform.pos - tri_p)
        penetration = sphere.radius - dist
        pos = (tri_p + sphere.transform.pos - n * sphere.radius) * 0.5
        return Contact(pos, n, penetration, *_combine(sphere, mesh))

    return sphere_face(jnp.take(mesh.vert, mesh.face, axis=0))


def _capsule_plane(capsule: Capsule, plane: Plane) -> Contact:
    """Two contacts, one per capsule end sphere."""
    segment = maths.rotate(
        jnp.array([0.0, 0.0, 1.0]) * capsule.length * 0.5, capsule.transform.rot
    )
    results = []
    for off in [segment, -segment]:
        sphere = Sphere(
            link_idx=capsule.link_idx,
            transform=Transform.create(pos=capsule.transform.pos + off),
            friction=capsule.friction,
            elasticity=capsule.elasticity,
            radius=capsule.radius,
        )
        results.append(_sphere_plane(sphere, plane))
    return tree_map(lambda *x: jnp.concatenate(x), *results)


def _capsule_capsule(cap_a: Capsule, cap_b: Capsule) -> Contact:
    seg_a = maths.rotate(
        jnp.array([0.0, 0.0, 1.0]) * cap_a.length * 0.5, cap_a.transform.rot
    )
    seg_b = maths.rotate(
        jnp.array([0.0, 0.0, 1.0]) * cap_b.length * 0.5, cap_b.transform.rot
    )
    pt_a, pt_b = geom_math.closest_segment_to_segment_points(
        cap_a.transform.pos - seg_a,
        cap_a.transform.pos + seg_a,
        cap_b.transform.pos - seg_b,
        cap_b.transform.pos + seg_b,
    )
    n, dist = maths.normalize_with_norm(pt_a - pt_b)
    penetration = cap_a.radius + cap_b.radius - dist
    pos = ((pt_a - n * cap_a.radius) + (pt_b + n * cap_b.radius)) * 0.5
    return _one(Contact(pos, n, penetration, *_combine(cap_a, cap_b)))


def _capsule_mesh(capsule: Capsule, mesh: Mesh) -> Contact:
    """One contact per mesh triangle."""

    @jax.vmap
    def capsule_face(face, face_norm):
        seg = maths.rotate(
            jnp.array([0.0, 0.0, 1.0]) * capsule.length * 0.5, capsule.transform.rot
        )
        end_a, end_b = capsule.transform.pos - seg, capsule.transform.pos + seg
        tri_norm = maths.rotate(face_norm, mesh.transform.rot)
        pt = mesh.transform.pos + maths.rotate(face, mesh.transform.rot[None])
        p0, p1, p2 = pt[..., 0, :], pt[..., 1, :], pt[..., 2, :]
        seg_p, tri_p = geom_math.closest_segment_triangle_points(
            end_a, end_b, p0, p1, p2, tri_norm
        )
        n, dist = maths.normalize_with_norm(seg_p - tri_p)
        penetration = capsule.radius - dist
        pos = (tri_p + seg_p - n * capsule.radius) * 0.5
        return Contact(pos, n, penetration, *_combine(capsule, mesh))

    face_vert = jnp.take(mesh.vert, mesh.face, axis=0)
    face_norm = geom_mesh.get_face_norm(mesh.vert, mesh.face)
    return capsule_face(face_vert, face_norm)


def _convex_convex(convex_a: Convex, convex_b: Convex) -> Contact:
    """SAT with a 4-point manifold."""
    normals_a = geom_mesh.get_face_norm(convex_a.vert, convex_a.face)
    normals_b = geom_mesh.get_face_norm(convex_b.vert, convex_b.face)
    faces_a = jnp.take(convex_a.vert, convex_a.face, axis=0)
    faces_b = jnp.take(convex_b.vert, convex_b.face, axis=0)

    def to_world(convex, faces, normals):
        faces = convex.transform.pos + maths.rotate(
            faces, convex.transform.rot[None, None]
        )
        normals = maths.rotate(normals, convex.transform.rot[None])
        return faces, normals

    faces_a, normals_a = to_world(convex_a, faces_a, normals_a)
    faces_b, normals_b = to_world(convex_b, faces_b, normals_b)

    vertices_a = convex_a.transform.pos + maths.rotate(
        convex_a.vert, convex_a.transform.rot[None]
    )
    vertices_b = convex_b.transform.pos + maths.rotate(
        convex_b.vert, convex_b.transform.rot[None]
    )

    unique_edges_a = jnp.take(vertices_a, convex_a.unique_edge, axis=0)
    unique_edges_b = jnp.take(vertices_b, convex_b.unique_edge, axis=0)

    c = geom_math.sat_hull_hull(
        faces_a,
        faces_b,
        vertices_a,
        vertices_b,
        normals_a,
        normals_b,
        unique_edges_a,
        unique_edges_b,
    )
    friction, elasticity, link_idx = tree_map(
        lambda x: jnp.repeat(x, 4), _combine(convex_a, convex_b)
    )
    return Contact(c.pos, c.normal, c.penetration, friction, elasticity, link_idx)


def _mesh_plane(mesh: Mesh, plane: Plane) -> Contact:
    """One contact per mesh vertex."""

    @jax.vmap
    def point_plane(vert):
        n = maths.rotate(jnp.array([0.0, 0.0, 1.0]), plane.transform.rot)
        pos = mesh.transform.pos + maths.rotate(vert, mesh.transform.rot)
        penetration = jnp.dot(plane.transform.pos - pos, n)
        return Contact(pos, n, penetration, *_combine(mesh, plane))

    return point_plane(mesh.vert)


_TYPE_FUN = {
    (Sphere, Plane): jax.vmap(_sphere_plane),
    (Sphere, Sphere): jax.vmap(_sphere_sphere),
    (Sphere, Capsule): jax.vmap(_sphere_capsule),
    (Sphere, Box): jax.vmap(_sphere_mesh),
    (Sphere, Mesh): jax.vmap(_sphere_mesh),
    (Capsule, Plane): jax.vmap(_capsule_plane),
    (Capsule, Capsule): jax.vmap(_capsule_capsule),
    (Capsule, Box): jax.vmap(_capsule_mesh),
    (Capsule, Mesh): jax.vmap(_capsule_mesh),
    (Convex, Convex): jax.vmap(_convex_convex),
    (Mesh, Plane): jax.vmap(_mesh_plane),
}


def _geom_pairs(
    sys: System, x: Transform
) -> List[Tuple[Optional[Callable[[Geom, Geom], Any]], Geom, Geom]]:
    """Moves each stacked pair into world frame and finds its contact fn."""
    geom_pairs = []
    for geom_a, geom_b in sys.contacts:
        fun = _TYPE_FUN.get((type(geom_a), type(geom_b)))
        if fun is None:
            fun = _TYPE_FUN.get((type(geom_b), type(geom_a)))
            if fun is None:
                raise RuntimeError(
                    f"unrecognized collider pair: {type(geom_a)}, {type(geom_b)}"
                )
            geom_a, geom_b = geom_b, geom_a

        tx_a = x.take(geom_a.link_idx).do(geom_a.transform)
        geom_a = geom_a.replace(transform=tx_a)
        if geom_b.link_idx is not None:  # static geoms stay in world frame
            tx_b = x.take(geom_b.link_idx).do(geom_b.transform)
            geom_b = geom_b.replace(transform=tx_b)
        geom_pairs.append((fun, geom_a, geom_b))
    return geom_pairs


def contact(sys: System, x: Transform) -> Optional[Contact]:
    """All contacts for the scene, stacked; None if no contact pairs.

    Parity: reference contact.py:306-330.
    """
    contacts = []
    for fun, geom_a, geom_b in _geom_pairs(sys, x):
        c = fun(geom_a, geom_b)
        c = tree_map(jnp.concatenate, c)
        contacts.append(c)
    if not contacts:
        return None
    return tree_map(lambda *x: jnp.concatenate(x), *contacts)
