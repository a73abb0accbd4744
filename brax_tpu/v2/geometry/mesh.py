"""Mesh preprocessing: boxes to meshes/hulls, convex hulls, unique edges.

Parity with reference brax/v2/geometry/mesh.py, minus its trimesh dependency:
convex hulls come from scipy.spatial.ConvexHull and coplanar triangle merging
is done here by grouping hull facets on their plane equations.  All of this
runs at scene-build time on the host (numpy), producing static arrays baked
into the System.
"""

from __future__ import annotations

import itertools
from typing import Dict, Tuple

import numpy as np
from scipy import spatial

from brax_tpu.v2.base import Box, Convex, Mesh

_BOX_CORNERS = np.array(list(itertools.product((-1, 1), (-1, 1), (-1, 1))))

# two CCW triangles per box side
_TRIANGULATED_BOX_FACES = np.array([
    0, 4, 1, 4, 5, 1,   # left
    0, 2, 4, 2, 6, 4,   # bottom
    6, 5, 4, 6, 7, 5,   # front
    2, 3, 6, 3, 7, 6,   # right
    1, 5, 3, 5, 7, 3,   # top
    0, 1, 2, 1, 3, 2,   # back
]).reshape(-1, 3)

# one CCW quad per box side
_BOX_FACES = np.array([
    0, 4, 5, 1,
    0, 2, 6, 4,
    6, 7, 5, 4,
    2, 3, 7, 6,
    1, 5, 7, 3,
    0, 1, 3, 2,
]).reshape(-1, 4)

_MAX_HULL_FACE_VERTICES = 20
_CONVEX_CACHE: Dict[Tuple[int, int], Convex] = {}


def get_face_norm(vert, face):
    """Face normals from CCW-wound faces (traced or static arrays)."""
    import jax.numpy as jnp

    face_vert = jnp.take(vert, jnp.asarray(face), axis=0)
    edge0 = face_vert[:, 1, :] - face_vert[:, 0, :]
    edge1 = face_vert[:, -1, :] - face_vert[:, 0, :]
    n = jnp.cross(edge0, edge1)
    return n / jnp.linalg.norm(n, axis=1, keepdims=True)


def get_unique_edges(vert: np.ndarray, face: np.ndarray) -> np.ndarray:
    """Deduplicates edges by direction (parallel edges collapse to one).

    SAT only needs one representative per edge direction; this keeps the
    edge-cross axis count small.
    """
    r_face = np.roll(face, 1, axis=1)
    edges = np.concatenate(np.array([face, r_face]).T)
    edges.sort(axis=1)
    edges = np.unique(edges, axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]

    edge_vert = vert.take(edges, axis=0)
    edge_dir = edge_vert[:, 0] - edge_vert[:, 1]
    edge_dir /= np.linalg.norm(edge_dir, axis=1, keepdims=True)

    # first representative among +/- direction matches
    diff1 = edge_dir[:, None, :] - edge_dir[None, :, :]
    diff2 = edge_dir[:, None, :] + edge_dir[None, :, :]
    matches = (np.linalg.norm(diff1, axis=-1) < 1e-6) | (
        np.linalg.norm(diff2, axis=-1) < 1e-6
    )
    first = np.tril(matches).sum(axis=-1) == 1
    return edges[np.where(first)[0]]


def _box_mesh(b: Box, triangulated: bool) -> Tuple[np.ndarray, np.ndarray]:
    halfsize = np.asarray(b.halfsize).reshape(3)
    vert = _BOX_CORNERS * halfsize
    face = _TRIANGULATED_BOX_FACES if triangulated else _BOX_FACES
    return vert.astype(np.float64), face


def box_tri(b: Box) -> Mesh:
    """Box -> triangulated Mesh (for capsule/sphere vs box narrowphase)."""
    vert, face = _box_mesh(b, triangulated=True)
    return Mesh(
        vert=vert,
        face=face,
        link_idx=b.link_idx,
        transform=b.transform,
        friction=b.friction,
        elasticity=b.elasticity,
    )


def box_hull(b: Box) -> Convex:
    """Box -> Convex with quad faces (for SAT box-box)."""
    vert, face = _box_mesh(b, triangulated=False)
    return Convex(
        vert=vert,
        face=face,
        link_idx=b.link_idx,
        transform=b.transform,
        friction=b.friction,
        elasticity=b.elasticity,
        unique_edge=get_unique_edges(vert, face),
    )


def _convex_hull_2d(points: np.ndarray, normal: np.ndarray) -> np.ndarray:
    """Orders coplanar points into a CCW polygon around `normal`."""
    best_axis = np.abs(np.eye(3) @ normal).argmax()
    axis = np.eye(3)[best_axis]
    d = (points @ axis).reshape((-1, 1))
    flat = points - d * axis
    flat2d = flat[:, sorted({0, 1, 2} - {best_axis})]
    hull = spatial.ConvexHull(flat2d)
    order = 1 if axis @ normal > 0 else -1
    return hull.vertices[::order]


def _merge_coplanar_facets(
    vert: np.ndarray, simplices: np.ndarray, equations: np.ndarray
) -> np.ndarray:
    """Merges hull triangles sharing a plane into polygon faces.

    scipy's hull gives triangles; SAT clipping wants one polygon per flat
    face (a box face should be one quad, not two triangles).  Triangles are
    grouped by their (rounded) plane equation and each group's vertices are
    re-ordered CCW; results pad to a common width.
    """
    keys = np.round(equations, 6)
    groups: Dict[tuple, list] = {}
    for i, k in enumerate(map(tuple, keys)):
        groups.setdefault(k, []).append(i)

    faces = []
    for k, tri_idx in groups.items():
        point_idx = np.unique(simplices[tri_idx])
        normal = np.array(k[:3])
        if len(point_idx) == 3:
            # single triangle: orient CCW wrt outward normal
            p = vert[point_idx]
            if np.cross(p[1] - p[0], p[2] - p[0]) @ normal < 0:
                point_idx = point_idx[::-1]
            faces.append(point_idx)
            continue
        order = _convex_hull_2d(vert[point_idx], normal)
        face = point_idx[order]
        every = face.shape[0] // _MAX_HULL_FACE_VERTICES + 1
        faces.append(face[::every])

    max_len = max(f.shape[0] for f in faces)
    faces = [
        np.pad(f, (0, max_len - f.shape[0]), "edge") if f.shape[0] < max_len else f
        for f in faces
    ]
    return np.array(faces)


def _convex_hull(m: Mesh) -> Convex:
    hull = spatial.ConvexHull(np.asarray(m.vert, dtype=np.float64))
    # re-index to hull vertices only
    used = np.unique(hull.simplices)
    remap = np.zeros(hull.points.shape[0], dtype=np.int64)
    remap[used] = np.arange(used.shape[0])
    vert = hull.points[used]
    simplices = remap[hull.simplices]

    # orient all triangles CCW wrt outward plane normals before merging
    face = _merge_coplanar_facets(vert, simplices, hull.equations)
    return Convex(
        vert=vert,
        face=face,
        link_idx=m.link_idx,
        transform=m.transform,
        friction=m.friction,
        elasticity=m.elasticity,
        unique_edge=get_unique_edges(vert, face),
    )


def convex_hull(mesh: Mesh) -> Convex:
    """Cached mesh -> convex hull conversion (build-time only)."""
    key = (
        hash(np.asarray(mesh.vert).tobytes()),
        hash(np.asarray(mesh.face).tobytes()),
    )
    if key not in _CONVEX_CACHE:
        _CONVEX_CACHE[key] = _convex_hull(mesh)
    return _CONVEX_CACHE[key]
