"""Scene tessellation: Config + QP -> world-space triangle soup (numpy).

Feeds the native rasterizer (io/native). Geometry generation mirrors the
collider coverage of the SDF path (sphere/capsule/box/plane/clipped plane/
heightmap/mesh); planes tessellate as checkered quad grids so the ground
reads like the SDF renderer's checkerboard.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as onp

from brax_tpu.sim.config import Config

_COLORS = onp.array(
    [
        (79, 119, 255), (255, 111, 89), (65, 211, 162), (255, 200, 87),
        (182, 126, 232), (111, 211, 255), (255, 159, 178), (167, 209, 41),
        (242, 133, 42), (136, 153, 170),
    ],
    dtype=onp.float32,
) / 255.0


def _quat_mat(q: onp.ndarray) -> onp.ndarray:
    """(..., 4) wxyz quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    m = onp.empty(q.shape[:-1] + (3, 3), onp.float32)
    m[..., 0, 0] = 1 - 2 * (y * y + z * z)
    m[..., 0, 1] = 2 * (x * y - w * z)
    m[..., 0, 2] = 2 * (x * z + w * y)
    m[..., 1, 0] = 2 * (x * y + w * z)
    m[..., 1, 1] = 1 - 2 * (x * x + z * z)
    m[..., 1, 2] = 2 * (y * z - w * x)
    m[..., 2, 0] = 2 * (x * z - w * y)
    m[..., 2, 1] = 2 * (y * z + w * x)
    m[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return m


def _euler_mat(deg: Tuple[float, float, float]) -> onp.ndarray:
    rx, ry, rz = onp.radians(onp.asarray(deg, onp.float64))
    cx, sx, cy, sy, cz, sz = (
        onp.cos(rx), onp.sin(rx), onp.cos(ry), onp.sin(ry),
        onp.cos(rz), onp.sin(rz),
    )
    mx = onp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    my = onp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    mz = onp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return (mx @ my @ mz).astype(onp.float32)


def capsule(radius: float, length: float, radial: int = 16, caps: int = 6):
    """Capsule along local z (spheres via length == 2 * radius)."""
    half = max(length / 2 - radius, 0.0)
    rows = [(i / caps) * onp.pi / 2 for i in range(caps + 1)]
    rows += [onp.pi / 2 + (i / caps) * onp.pi / 2 for i in range(caps + 1)]
    zc = [half] * (caps + 1) + [-half] * (caps + 1)
    verts, faces = [], []
    for phi, z0 in zip(rows, zc):
        for i in range(radial + 1):
            th = 2 * onp.pi * i / radial
            sp, cp = onp.sin(phi), onp.cos(phi)
            verts.append(
                (radius * sp * onp.cos(th), radius * sp * onp.sin(th),
                 radius * cp + z0)
            )
    n = radial + 1
    for r in range(2 * caps + 1):
        for i in range(radial):
            a = r * n + i
            faces += [(a, a + n, a + 1), (a + 1, a + n, a + n + 1)]
    return onp.asarray(verts, onp.float32), onp.asarray(faces, onp.int32)


def box(halfsize):
    hx, hy, hz = halfsize
    v = onp.array(
        [(sx * hx, sy * hy, sz * hz)
         for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        onp.float32,
    )
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
        (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    return v, onp.asarray(faces, onp.int32)


def checker_plane(center_xy, size: float = 40.0, n: int = 16):
    """Ground as an n x n checkered quad grid; returns (verts, faces,
    face_shades) with per-face brightness in {0.8, 1.0}."""
    xs = onp.linspace(-size / 2, size / 2, n + 1) + center_xy[0]
    ys = onp.linspace(-size / 2, size / 2, n + 1) + center_xy[1]
    verts, faces, shade = [], [], []
    for j in range(n + 1):
        for i in range(n + 1):
            verts.append((xs[i], ys[j], 0.0))
    for j in range(n):
        for i in range(n):
            a = j * (n + 1) + i
            s = 0.8 + 0.2 * ((i + j) % 2)
            faces += [(a, a + 1, a + n + 1), (a + 1, a + n + 2, a + n + 1)]
            shade += [s, s]
    return (
        onp.asarray(verts, onp.float32),
        onp.asarray(faces, onp.int32),
        onp.asarray(shade, onp.float32),
    )


def heightmap(size: float, data):
    data = onp.asarray(data, onp.float32)
    n = int(onp.sqrt(len(data)))
    grid = data.reshape(n, n)  # [x_idx, y_idx], corner-anchored
    verts, faces = [], []
    step = size / max(n - 1, 1)
    for j in range(n):
        for i in range(n):
            verts.append((i * step, j * step, grid[i, j]))
    for j in range(n - 1):
        for i in range(n - 1):
            a = j * n + i
            faces += [(a, a + 1, a + n), (a + 1, a + n + 1, a + n)]
    return onp.asarray(verts, onp.float32), onp.asarray(faces, onp.int32)


@dataclasses.dataclass
class ScenePrim:
    body: int
    verts: onp.ndarray       # (v, 3) local
    faces: onp.ndarray       # (f, 3)
    color: onp.ndarray       # (3,) base linear RGB
    face_shade: onp.ndarray  # (f,) multiplier (checker) or ones
    off_pos: onp.ndarray     # (3,)
    off_mat: onp.ndarray     # (3, 3)


def build_scene(config: Config) -> List[ScenePrim]:
    geoms = {m.name: m for m in config.mesh_geometries}
    prims: List[ScenePrim] = []
    for bi, b in enumerate(config.bodies):
        for c in b.colliders:
            if c.hidden:
                continue
            shade = None
            color = _COLORS[bi % len(_COLORS)]
            if c.capsule is not None:
                v, f = capsule(c.capsule.radius, c.capsule.length)
            elif c.sphere is not None:
                v, f = capsule(c.sphere.radius, 2 * c.sphere.radius)
            elif c.box is not None:
                v, f = box(c.box.halfsize)
            elif c.plane is not None or c.clipped_plane is not None:
                v, f, sh = checker_plane((0.0, 0.0))
                shade = sh
                color = onp.array([0.55, 0.55, 0.6], onp.float32)
            elif c.heightmap is not None and len(c.heightmap.data):
                v, f = heightmap(c.heightmap.size, c.heightmap.data)
                color = onp.array([0.5, 0.52, 0.55], onp.float32)
            elif c.mesh is not None and c.mesh.name in geoms:
                g = geoms[c.mesh.name]
                v = onp.asarray(g.vertices, onp.float32) * (c.mesh.scale or 1.0)
                f = onp.asarray(g.faces, onp.int32).reshape(-1, 3)
            else:
                continue
            prims.append(
                ScenePrim(
                    body=bi,
                    verts=v,
                    faces=f,
                    color=onp.asarray(color, onp.float32),
                    face_shade=(
                        shade
                        if shade is not None
                        else onp.ones(len(f), onp.float32)
                    ),
                    off_pos=onp.asarray(c.position, onp.float32),
                    off_mat=_euler_mat(tuple(c.rotation)),
                )
            )
    return prims


def world_triangles(prims: List[ScenePrim], pos: onp.ndarray, rot: onp.ndarray):
    """Transforms the scene to world space for one frame.

    pos: (nb, 3); rot: (nb, 4) wxyz.  Returns (verts, tris, tri_colors).
    """
    mats = _quat_mat(onp.asarray(rot, onp.float32))
    pos = onp.asarray(pos, onp.float32)
    all_v, all_f, all_c = [], [], []
    base = 0
    for p in prims:
        local = p.verts @ p.off_mat.T + p.off_pos
        world = local @ mats[p.body].T + pos[p.body]
        all_v.append(world)
        all_f.append(p.faces + base)
        all_c.append(p.color[None, :] * p.face_shade[:, None])
        base += len(world)
    return (
        onp.concatenate(all_v),
        onp.concatenate(all_f),
        onp.concatenate(all_c),
    )
