"""Native MJCF (MuJoCo XML) scene compiler.

The reference (brax/v2/io/mjcf.py:293-518) parses MJCF by round-tripping
through the `mujoco` bindings and reading the compiled MjModel arrays.  That
dependency is not available here, so this module implements the needed subset
of MuJoCo's compile semantics directly:

- body tree with pos/quat/euler frames; massless-intermediate-body fusing
  (reference mjcf.py:86-102)
- geoms: plane/sphere/capsule/box/mesh with fromto, density-or-mass inertia
  (exact solid formulas; mesh inertia via convex-hull tetrahedralization)
- per-body inertial accumulation -> CoM frame + principal axes, or explicit
  <inertial> elements (compiler inertiafromgeom)
- joints: free/hinge(1-dof)/stacked hinges(2/3-dof)/slide, angle-unit
  handling, ranges, armature/damping/stiffness
- actuators: <motor> ('m') and <position> ('p') with gear/ctrlrange
- contact pairs: <pair> under collision="predefined", else all valid
  type-pairs; box/mesh promotion to hulls for SAT
- <custom> numeric/tuple params (init_qpos, elasticity, constraint_*, ...)
- invweight (mean inverse inertia at init_q) computed with this engine's own
  CRB mass matrix rather than read from MjModel

STL mesh assets load via a small binary/ASCII reader (no trimesh).
"""

from __future__ import annotations

import io
import itertools
import os
import struct as pystruct
from typing import Dict, List, Optional, Tuple
from xml.etree import ElementTree

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import tree_map

from brax_tpu.v2.base import (
    Actuator,
    Box,
    Capsule,
    Convex,
    DoF,
    Geometry,
    Inertia,
    Link,
    Mesh,
    Motion,
    Plane,
    Sphere,
    System,
    Transform,
)
from brax_tpu.v2.geometry import mesh as geom_mesh

# pairs eligible for contact generation: ((type, is_static), (type, is_static))
_COLLIDABLES = [
    ((Sphere, False), (Plane, True)),
    ((Sphere, False), (Sphere, False)),
    ((Sphere, False), (Capsule, False)),
    ((Sphere, False), (Box, False)),
    ((Sphere, False), (Mesh, False)),
    ((Capsule, False), (Plane, True)),
    ((Capsule, False), (Capsule, False)),
    ((Capsule, False), (Box, False)),
    ((Capsule, False), (Mesh, False)),
    ((Box, False), (Plane, True)),
    ((Box, False), (Box, False)),
    ((Box, False), (Mesh, False)),
    ((Mesh, False), (Plane, True)),
    ((Mesh, False), (Mesh, False)),
]


def _arr(s: str, n: Optional[int] = None) -> np.ndarray:
    a = np.array([float(x) for x in s.split()])
    if n is not None and a.shape[0] != n:
        raise ValueError(f"expected {n} values, got {a.shape[0]}: {s!r}")
    return a


def _euler_to_quat_deg(v: np.ndarray, degrees: bool) -> np.ndarray:
    """MuJoCo default eulerseq 'xyz' (extrinsic x-y-z)."""
    if degrees:
        v = v * np.pi / 180.0
    c, s = np.cos(v / 2), np.sin(v / 2)
    # extrinsic xyz == intrinsic z-y'-x'' reversed; compose q = qz*qy*qx? no:
    # extrinsic rotations about fixed axes x, then y, then z: q = qz qy qx
    qx = np.array([c[0], s[0], 0, 0])
    qy = np.array([c[1], 0, s[1], 0])
    qz = np.array([c[2], 0, 0, s[2]])
    return _quat_mul(_quat_mul(qz, qy), qx)


def _quat_mul(u, v):
    return np.array(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ]
    )


def _quat_rotate(v, q):
    s, u = q[0], q[1:]
    return 2 * (u @ v) * u + (s * s - u @ u) * v + 2 * s * np.cross(u, v)


def _quat_to_mat(q):
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def _z_to_vec_quat(vec: np.ndarray) -> np.ndarray:
    """Quaternion rotating +z onto vec (for fromto geom frames)."""
    z = np.array([0.0, 0.0, 1.0])
    v = vec / np.linalg.norm(vec)
    d = z @ v
    if d > 1 - 1e-9:
        return np.array([1.0, 0.0, 0.0, 0.0])
    if d < -1 + 1e-9:
        return np.array([0.0, 1.0, 0.0, 0.0])  # pi about x
    axis = np.cross(z, v)
    axis /= np.linalg.norm(axis)
    half = np.arccos(np.clip(d, -1, 1)) / 2
    return np.concatenate([[np.cos(half)], axis * np.sin(half)])


def _axisangle_to_quat(v: np.ndarray, degrees: bool) -> np.ndarray:
    axis, angle = v[:3], v[3]
    if degrees:
        angle = angle * np.pi / 180.0
    axis = axis / np.linalg.norm(axis)
    return np.concatenate([[np.cos(angle / 2)], axis * np.sin(angle / 2)])


def _frame_quat(elem, degrees: bool) -> np.ndarray:
    if "quat" in elem.attrib:
        q = _arr(elem.attrib["quat"], 4)
        return q / np.linalg.norm(q)
    if "euler" in elem.attrib:
        return _euler_to_quat_deg(_arr(elem.attrib["euler"], 3), degrees)
    if "axisangle" in elem.attrib:
        return _axisangle_to_quat(_arr(elem.attrib["axisangle"], 4), degrees)
    return np.array([1.0, 0.0, 0.0, 0.0])


# ---------------------------------------------------------------------------
# STL mesh loading
# ---------------------------------------------------------------------------


def load_stl(data: bytes, scale: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Parses binary or ASCII STL into (vert, face) with vertex dedup."""
    tris = None
    if data[:5].lower() == b"solid":
        try:
            text = data.decode("ascii")
            verts = []
            for line in text.splitlines():
                line = line.strip()
                if line.startswith("vertex"):
                    verts.append([float(x) for x in line.split()[1:4]])
            tris = np.array(verts).reshape((-1, 3, 3))
        except (UnicodeDecodeError, ValueError):
            tris = None
    if tris is None:
        (n,) = pystruct.unpack("<I", data[80:84])
        rec = np.frombuffer(data[84 : 84 + n * 50], dtype=np.uint8).reshape(n, 50)
        tris = rec[:, 12:48].copy().view("<f4").reshape(n, 3, 3).astype(np.float64)

    flat = tris.reshape((-1, 3)) * scale
    vert, inv = np.unique(np.round(flat, 9), axis=0, return_inverse=True)
    face = inv.reshape((-1, 3))
    return vert, face


# ---------------------------------------------------------------------------
# solid inertia formulas (about geom CoM, geom frame)
# ---------------------------------------------------------------------------


def _sphere_mass_inertia(r: float, density: float, mass: Optional[float]):
    vol = 4.0 / 3.0 * np.pi * r**3
    m = mass if mass is not None else density * vol
    i = 2.0 / 5.0 * m * r * r
    return m, np.diag([i, i, i]), np.zeros(3)


def _capsule_mass_inertia(r: float, half_len: float, density: float, mass):
    """Cylinder of length 2*half_len plus two hemispherical caps."""
    length = 2 * half_len
    vol_c = np.pi * r * r * length
    vol_s = 4.0 / 3.0 * np.pi * r**3
    vol = vol_c + vol_s
    density = (mass / vol) if mass is not None else density
    mc, ms = density * vol_c, density * vol_s
    izz = mc * r * r / 2.0 + ms * 2.0 * r * r / 5.0
    ixx = (
        mc * (3 * r * r + length * length) / 12.0
        + ms * (2.0 * r * r / 5.0 + half_len * half_len + 3.0 * half_len * r / 8.0 * 2)
    )
    m = mc + ms
    return m, np.diag([ixx, ixx, izz]), np.zeros(3)


def _box_mass_inertia(halfsize: np.ndarray, density: float, mass):
    vol = 8.0 * np.prod(halfsize)
    m = mass if mass is not None else density * vol
    hx, hy, hz = halfsize
    i = m / 3.0 * np.array([hy * hy + hz * hz, hx * hx + hz * hz, hx * hx + hy * hy])
    return m, np.diag(i), np.zeros(3)


def _mesh_mass_inertia(vert: np.ndarray, face: np.ndarray, density: float, mass):
    """Volume/CoM/inertia of the convex hull via signed tetrahedra.

    Each hull triangle forms a tetrahedron with the hull CoM; for a tet with
    one vertex at the origin the second moment is det(A) * A^T C A with A the
    other three vertices as rows and C the canonical unit-tet covariance.
    """
    from scipy import spatial

    hull = spatial.ConvexHull(vert)
    total_vol, com = 0.0, np.zeros(3)
    tris = []
    for simplex, eq in zip(hull.simplices, hull.equations):
        p = hull.points[simplex]
        # orient outward so signed volumes sum to the hull volume
        if np.cross(p[1] - p[0], p[2] - p[0]) @ eq[:3] < 0:
            p = p[::-1]
        tris.append(p)
        v = np.linalg.det(p) / 6.0
        total_vol += v
        com += v * p.sum(axis=0) / 4.0
    com /= total_vol
    m = mass if mass is not None else density * total_vol
    rho = m / total_vol

    c_can = np.full((3, 3), 1.0 / 120.0) + np.eye(3) / 120.0  # 1/60 diag
    inertia = np.zeros((3, 3))
    for p in tris:
        a = p - com  # tet (0, a0, a1, a2) about the CoM
        cov = np.linalg.det(a) * a.T @ c_can @ a
        inertia += rho * (np.trace(cov) * np.eye(3) - cov)
    return m, inertia, com


# ---------------------------------------------------------------------------
# fusing jointless intermediate bodies
# ---------------------------------------------------------------------------


def _fuse_bodies(elem: ElementTree.Element):
    """Merges child bodies without joints into their parent (offsetting pos)."""
    for child in list(elem):
        if child.tag == "body" and "joint" not in [e.tag for e in child]:
            cpos = _arr(child.attrib.get("pos", "0 0 0"), 3)
            for grandchild in child:
                if grandchild.tag in ("body", "geom") and (cpos != 0).any():
                    gpos = _arr(grandchild.attrib.get("pos", "0 0 0"), 3) + cpos
                    grandchild.attrib["pos"] = " ".join("%f" % x for x in gpos)
                elem.append(grandchild)
            elem.remove(child)
        _fuse_bodies(child)


def fuse_bodies(xml: str) -> str:
    elem = ElementTree.fromstring(xml)
    _fuse_bodies(elem)
    return ElementTree.tostring(elem, encoding="unicode")


# ---------------------------------------------------------------------------
# the compiler
# ---------------------------------------------------------------------------


class _Compiler:
    def __init__(self, root: ElementTree.Element, asset_path: Optional[str]):
        self.root = root
        self.asset_path = asset_path

        comp = root.find("compiler")
        self.degrees = (comp is None) or comp.get("angle", "degree") == "degree"
        self.inertiafromgeom = (
            comp.get("inertiafromgeom", "auto") if comp is not None else "auto"
        )

        opt = root.find("option")
        self.timestep = float(opt.get("timestep", 0.002)) if opt is not None else 0.002
        self.gravity = (
            _arr(opt.get("gravity", "0 0 -9.81"), 3)
            if opt is not None
            else np.array([0.0, 0.0, -9.81])
        )
        self.iterations = int(opt.get("iterations", 50)) if opt is not None else 50
        self.predefined_pairs = (
            opt is not None and opt.get("collision", "all") == "predefined"
        )

        self.defaults: Dict[str, Dict[str, str]] = {}
        default = root.find("default")
        if default is not None:
            for child in default:
                self.defaults[child.tag] = dict(child.attrib)

        # mesh assets
        self.meshes: Dict[str, Tuple[np.ndarray, np.ndarray]] = {}
        asset = root.find("asset")
        if asset is not None:
            for m in asset.findall("mesh"):
                fname = m.get("file")
                scale = _arr(m.get("scale", "1 1 1"), 3)
                path = os.path.join(asset_path or ".", fname)
                with open(path, "rb") as f:
                    vert, face = load_stl(f.read(), scale)
                self.meshes[m.get("name", fname)] = (vert, face)

        # per-body/geom/joint records, filled by _walk
        self.body_names: List[str] = []
        self.body_parent: List[int] = []
        self.body_pos: List[np.ndarray] = []
        self.body_quat: List[np.ndarray] = []
        self.body_inertial: List[Optional[tuple]] = []  # (ipos, iquat, idiag, mass)
        self.body_geoms: List[list] = []
        self.joints: List[dict] = []  # per joint-element records
        self.geoms: List[dict] = []  # flat geom records incl. world geoms

    def _attrs(self, elem) -> Dict[str, str]:
        merged = dict(self.defaults.get(elem.tag, {}))
        merged.update(elem.attrib)
        return merged

    # -- body tree -----------------------------------------------------------

    def _walk_body(self, elem, parent: int):
        a = self._attrs(elem) if elem.tag == "body" else {}
        body_id = len(self.body_names)
        self.body_names.append(elem.get("name", f"body{body_id}"))
        self.body_parent.append(parent)
        self.body_pos.append(_arr(a.get("pos", "0 0 0"), 3))
        self.body_quat.append(_frame_quat(elem, self.degrees))
        self.body_inertial.append(None)
        self.body_geoms.append([])

        for child in elem:
            if child.tag == "joint":
                self._compile_joint(child, body_id)
            elif child.tag == "geom":
                g = self._compile_geom(child, body_id)
                self.body_geoms[body_id].append(g)
            elif child.tag == "inertial":
                ia = child.attrib
                self.body_inertial[body_id] = (
                    _arr(ia.get("pos", "0 0 0"), 3),
                    _frame_quat(child, self.degrees),
                    _arr(ia["diaginertia"], 3) if "diaginertia" in ia else None,
                    float(ia["mass"]),
                )
            elif child.tag == "body":
                self._walk_body(child, body_id)

    def _compile_joint(self, elem, body_id: int):
        a = self._attrs(elem)
        typ = a.get("type", "hinge")
        axis = _arr(a.get("axis", "0 0 1"), 3)
        axis = axis / np.linalg.norm(axis)
        limited = a.get("limited", "false") in ("true", "1")
        rng = _arr(a.get("range", "0 0"), 2)
        if self.degrees and typ in ("hinge", "ball"):
            rng = rng * np.pi / 180.0
        self.joints.append(
            dict(
                body=body_id,
                type=typ,
                axis=axis,
                pos=_arr(a.get("pos", "0 0 0"), 3),
                limited=limited,
                range=rng,
                stiffness=float(a.get("stiffness", 0.0)),
                damping=float(a.get("damping", 0.0)),
                armature=float(a.get("armature", 0.0)),
                name=elem.get("name", f"joint{len(self.joints)}"),
            )
        )

    def _compile_geom(self, elem, body_id: Optional[int]) -> dict:
        a = self._attrs(elem)
        typ = a.get("type", "sphere")
        pos = _arr(a.get("pos", "0 0 0"), 3)
        quat = _frame_quat(elem, self.degrees)
        size = _arr(a["size"]) if "size" in a else np.zeros(3)
        density = float(a.get("density", 1000.0))
        mass = float(a["mass"]) if "mass" in a else None
        friction = _arr(a.get("friction", "1 0.005 0.0001"))[0]

        length = None
        if "fromto" in a:
            ft = _arr(a["fromto"], 6)
            p0, p1 = ft[:3], ft[3:]
            pos = (p0 + p1) / 2
            length = float(np.linalg.norm(p1 - p0))
            quat = _z_to_vec_quat(p1 - p0)

        rec = dict(
            type=typ,
            body=body_id,
            pos=pos,
            quat=quat,
            size=size,
            density=density,
            mass=mass,
            friction=friction,
            length=length,
            mesh=a.get("mesh"),
            name=elem.get("name", f"geom{len(self.geoms)}"),
        )
        self.geoms.append(rec)
        return rec

    # -- inertia -------------------------------------------------------------

    def _geom_mass_inertia(self, g: dict):
        """(mass, inertia 3x3 about geom-frame CoM, CoM offset in geom frame)."""
        typ = g["type"]
        if typ == "plane":
            return 0.0, np.zeros((3, 3)), np.zeros(3)
        if typ == "sphere":
            return _sphere_mass_inertia(g["size"][0], g["density"], g["mass"])
        if typ == "capsule":
            half = g["length"] / 2 if g["length"] is not None else g["size"][1]
            return _capsule_mass_inertia(g["size"][0], half, g["density"], g["mass"])
        if typ == "box":
            return _box_mass_inertia(g["size"][:3], g["density"], g["mass"])
        if typ == "mesh":
            vert, face = self.meshes[g["mesh"]]
            return _mesh_mass_inertia(vert, face, g["density"], g["mass"])
        raise NotImplementedError(f"geom type {typ}")

    def _body_inertia(self, body_id: int):
        """Accumulates geoms -> (mass, ipos, iquat, diag inertia)."""
        use_geoms = self.inertiafromgeom == "true" or (
            self.body_inertial[body_id] is None
        )
        if not use_geoms:
            ipos, iquat, idiag, mass = self.body_inertial[body_id]
            if idiag is None:
                idiag = np.zeros(3)
            return mass, ipos, iquat, idiag

        total_m, msum = 0.0, np.zeros(3)
        parts = []
        for g in self.body_geoms[body_id]:
            m, i_com, com_off = self._geom_mass_inertia(g)
            rot = _quat_to_mat(g["quat"])
            com_world = g["pos"] + rot @ com_off
            i_body = rot @ i_com @ rot.T
            parts.append((m, com_world, i_body))
            total_m += m
            msum += m * com_world
        if total_m <= 0:
            return 0.0, np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3)
        ipos = msum / total_m

        itot = np.zeros((3, 3))
        for m, com, i_body in parts:
            d = com - ipos
            itot += i_body + m * ((d @ d) * np.eye(3) - np.outer(d, d))

        evals, evecs = np.linalg.eigh(itot)
        # descending principal moments, right-handed frame (MuJoCo convention)
        order = np.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        if np.linalg.det(evecs) < 0:
            evecs[:, 2] *= -1
        w = np.sqrt(max(1 + np.trace(evecs), 1e-12)) / 2
        iquat = np.array(
            [
                w,
                (evecs[2, 1] - evecs[1, 2]) / (4 * w),
                (evecs[0, 2] - evecs[2, 0]) / (4 * w),
                (evecs[1, 0] - evecs[0, 1]) / (4 * w),
            ]
        )
        iquat /= np.linalg.norm(iquat)
        return total_m, ipos, iquat, evals

    # -- system assembly -----------------------------------------------------

    def compile(self) -> System:
        world = self.root.find("worldbody")
        if world is None:
            raise ValueError("mjcf missing <worldbody>")

        # world "body" 0, then the tree
        self.body_names.append("world")
        self.body_parent.append(-1)
        self.body_pos.append(np.zeros(3))
        self.body_quat.append(np.array([1.0, 0, 0, 0]))
        self.body_inertial.append(None)
        self.body_geoms.append([])
        for child in world:
            if child.tag == "geom":
                self._compile_geom(child, 0)  # static world geom
                self.body_geoms[0].append(self.geoms[-1])
            elif child.tag == "body":
                self._walk_body(child, 0)

        nbody = len(self.body_names)

        # group joints by body; derive link types
        joints_by_body: Dict[int, List[dict]] = {}
        for j in self.joints:
            joints_by_body.setdefault(j["body"], []).append(j)
        for b in range(1, nbody):
            if b not in joints_by_body:
                raise RuntimeError(
                    f"body {self.body_names[b]} has no joint after fusing"
                )

        link_types = ""
        link_order = list(range(1, nbody))  # skip world
        joint_pos = []
        motions, limits, stiffness, damping, armature = [], [], [], [], []
        any_limit = False
        jnt_meta = []  # (name, qid, qdid) for actuator binding
        q_off, qd_off = 0, 0
        for b in link_order:
            js = joints_by_body[b]
            types = [j["type"] for j in js]
            pos0 = js[0]["pos"]
            for j in js:
                if not np.allclose(j["pos"], pos0):
                    raise RuntimeError("joint stack: only one joint position allowed")
            joint_pos.append(pos0)
            if types == ["free"]:
                link_types += "f"
                motions.append(Motion(ang=np.eye(6, 3, -3), vel=np.eye(6, 3)))
                limits.append((np.full(6, -np.inf), np.full(6, np.inf)))
                stiffness.extend([0.0] * 6)
                damping.extend([js[0]["damping"]] * 6)
                armature.extend([js[0]["armature"]] * 6)
                jnt_meta.append((js[0]["name"], q_off, qd_off))
                q_off += 7
                qd_off += 6
            elif types == ["ball"]:
                link_types += "3"
                motions.append(Motion(ang=np.eye(3), vel=np.zeros((3, 3))))
                limits.append((np.full(3, -np.inf), np.full(3, np.inf)))
                stiffness.extend([0.0] * 3)
                damping.extend([js[0]["damping"]] * 3)
                armature.extend([js[0]["armature"]] * 3)
                jnt_meta.append((js[0]["name"], q_off, qd_off))
                q_off += 3
                qd_off += 3
            elif all(t in ("hinge", "slide") for t in types) and 1 <= len(types) <= 3:
                link_types += str(len(types))
                for j in js:
                    if j["type"] == "hinge":
                        motions.append(
                            Motion(
                                ang=j["axis"].reshape(1, 3), vel=np.zeros((1, 3))
                            )
                        )
                    else:
                        motions.append(
                            Motion(
                                ang=np.zeros((1, 3)), vel=j["axis"].reshape(1, 3)
                            )
                        )
                    lo, hi = (
                        (j["range"][0], j["range"][1])
                        if j["limited"]
                        else (-np.inf, np.inf)
                    )
                    any_limit |= j["limited"]
                    limits.append((np.array([lo]), np.array([hi])))
                    stiffness.append(j["stiffness"])
                    damping.append(j["damping"])
                    armature.append(j["armature"])
                    jnt_meta.append((j["name"], q_off, qd_off))
                    q_off += 1
                    qd_off += 1
            else:
                raise NotImplementedError(f"joint stack {types}")

        motion = tree_map(lambda *x: np.concatenate(x), *motions)
        limit = None
        if any_limit:
            limit = (
                np.concatenate([l[0] for l in limits]),
                np.concatenate([l[1] for l in limits]),
            )

        # custom params
        custom = self._get_custom(nbody)

        # body inertia
        mass_arr, ipos_arr, iquat_arr, idiag_arr = [], [], [], []
        for b in range(nbody):
            m, ipos, iquat, idiag = (
                self._body_inertia(b) if b > 0 else (0.0, np.zeros(3), np.array([1.0, 0, 0, 0]), np.zeros(3))
            )
            mass_arr.append(m)
            ipos_arr.append(ipos)
            iquat_arr.append(iquat)
            idiag_arr.append(idiag)

        # link arrays (skip world, like the reference skips mj body 0)
        sel = link_order
        body_pos = np.stack([self.body_pos[b] for b in sel])
        body_quat = np.stack([self.body_quat[b] for b in sel])
        # free links keep their q in world frame: clear the link transform
        for i, t in enumerate(link_types):
            if t == "f":
                body_pos[i] = np.zeros(3)
                body_quat[i] = np.array([1.0, 0, 0, 0])

        link = Link(
            transform=Transform(pos=body_pos, rot=body_quat),
            joint=Transform(
                pos=np.stack(joint_pos),
                rot=np.tile(np.array([1.0, 0, 0, 0]), (len(sel), 1)),
            ),
            inertia=Inertia(
                transform=Transform(
                    pos=np.stack([ipos_arr[b] for b in sel]),
                    rot=np.stack([iquat_arr[b] for b in sel]),
                ),
                i=np.stack([np.diag(idiag_arr[b]) for b in sel]),
                mass=np.array([mass_arr[b] for b in sel]),
            ),
            invweight=np.zeros(len(sel)),  # filled by _compute_invweight
            constraint_stiffness=custom["constraint_stiffness"][1:],
            constraint_damping=custom["constraint_damping"][1:],
            constraint_limit_stiffness=custom["constraint_limit_stiffness"][1:],
            constraint_ang_damping=custom["constraint_ang_damping"][1:],
        )

        dof = DoF(
            motion=motion,
            armature=np.array(armature),
            stiffness=np.array(stiffness),
            damping=np.array(damping),
            limit=limit,
            invweight=np.zeros(qd_off),
        )

        # geoms -> typed Geometry objects (link-indexed, skipping world)
        geom_elasticity = custom["elasticity"]
        geom_objs: List[Geometry] = []
        for gi, g in enumerate(self.geoms):
            link_idx = None if g["body"] in (None, 0) else g["body"] - 1
            kwargs = dict(
                link_idx=link_idx,
                transform=Transform(pos=g["pos"], rot=g["quat"]),
                friction=np.float64(g["friction"]),
                elasticity=np.float64(geom_elasticity[gi]),
            )
            typ = g["type"]
            if typ == "plane":
                geom_objs.append(Plane(**kwargs))
            elif typ == "sphere":
                geom_objs.append(Sphere(radius=g["size"][0], **kwargs))
            elif typ == "capsule":
                length = (
                    g["length"] if g["length"] is not None else 2 * g["size"][1]
                )
                geom_objs.append(Capsule(radius=g["size"][0], length=length, **kwargs))
            elif typ == "box":
                geom_objs.append(Box(halfsize=g["size"][:3], **kwargs))
            elif typ == "mesh":
                vert, face = self.meshes[g["mesh"]]
                geom_objs.append(Mesh(vert=vert, face=face, **kwargs))
            else:
                raise NotImplementedError(typ)

        contacts = self._contacts(geom_objs)

        # actuators
        act_gear, act_ctrl, act_types, act_link, act_qid, act_qdid = (
            [],
            [],
            "",
            [],
            [],
            [],
        )
        jnt_by_name = {name: (qid, qdid) for name, qid, qdid in jnt_meta}
        # map joint name -> owning link
        jname_link = {}
        li = 0
        for b in link_order:
            for j in joints_by_body[b]:
                jname_link[j["name"]] = li
            li += 1

        act_elem = self.root.find("actuator")
        if act_elem is not None:
            for a in act_elem:
                if a.tag not in ("motor", "position"):
                    continue
                attrs = dict(self.defaults.get(a.tag, {}))
                attrs.update(a.attrib)
                jname = attrs["joint"]
                qid, qdid = jnt_by_name[jname]
                limited = attrs.get("ctrllimited", "false") in ("true", "1")
                rng = (
                    _arr(attrs.get("ctrlrange", "-1 1"), 2)
                    if limited
                    else np.array([-np.inf, np.inf])
                )
                act_gear.append(float(attrs.get("gear", 1.0)))
                act_ctrl.append(rng)
                act_types += "m" if a.tag == "motor" else "p"
                act_link.append(jname_link[jname])
                act_qid.append(qid)
                act_qdid.append(qdid)

        actuator = Actuator(
            ctrl_range=np.array(act_ctrl).reshape(-1, 2),
            gear=np.array(act_gear),
        )

        # init q
        if "init_qpos" in custom:
            init_q = np.asarray(custom["init_qpos"], dtype=np.float64)
        else:
            init_q = self._default_qpos(link_types, link_order)

        sys = System(
            dt=self.timestep,
            gravity=self.gravity,
            link=link,
            dof=dof,
            geoms=geom_objs,
            contacts=contacts,
            actuator=actuator,
            init_q=init_q,
            vel_damping=custom["vel_damping"],
            ang_damping=custom["ang_damping"],
            baumgarte_erp=custom["baumgarte_erp"],
            link_names=tuple(self.body_names[b] for b in link_order),
            link_types=link_types,
            link_parents=tuple(
                self.body_parent[b] - 1 for b in link_order
            ),
            actuator_types=act_types,
            actuator_link_id=tuple(act_link),
            actuator_qid=tuple(act_qid),
            actuator_qdid=tuple(act_qdid),
            solver_iterations=self.iterations,
        )
        # leaves stay numpy (jnp dtype rules applied host-side) until ONE
        # batched device_put: eager per-leaf jnp.asarray costs a blocking
        # RPC per leaf on a tunnel-remote TPU (see sim/builder._f32)
        sys = tree_map(_np_canonical, sys)
        sys = _compute_invweight(sys)
        return jax.device_put(sys)

    def _default_qpos(self, link_types: str, link_order) -> np.ndarray:
        """qpos0: identity joint coordinates; free joints at body world frame."""
        out = []
        for i, t in enumerate(link_types):
            if t == "f":
                b = link_order[i]
                out.extend(self.body_pos[b])
                out.extend(self.body_quat[b])
            else:
                out.extend([0.0] * {"1": 1, "2": 2, "3": 3}[t])
        return np.array(out)

    def _get_custom(self, nbody: int) -> Dict[str, np.ndarray]:
        """<custom> numeric/tuple params with brax defaults (mjcf.py:150-204)."""
        ngeom = len(self.geoms)
        default = {
            "vel_damping": (0.0, None),
            "ang_damping": (0.0, None),
            "baumgarte_erp": (0.1, None),
            "elasticity": (0.0, "geom"),
            "constraint_stiffness": (2000.0, "body"),
            "constraint_damping": (150.0, "body"),
            "constraint_limit_stiffness": (1000.0, "body"),
            "constraint_ang_damping": (0.0, "body"),
        }
        custom_elem = self.root.find("custom")
        numerics, tuples = {}, {}
        if custom_elem is not None:
            for n in custom_elem.findall("numeric"):
                numerics[n.get("name")] = _arr(n.get("data"))
            for t in custom_elem.findall("tuple"):
                tuples[t.get("name")] = [
                    (e.get("objtype"), e.get("objname"), float(e.get("prm")))
                    for e in t.findall("element")
                ]

        sizes = {"body": nbody, "geom": ngeom}
        custom = {}
        for name, (val, typ) in default.items():
            v = numerics.get(name, np.array(val))
            size = sizes.get(typ)
            custom[name] = (
                np.repeat(v, size) if size else np.array(v).squeeze()
            )
        for name, v in numerics.items():
            if name not in custom:
                custom[name] = v

        geom_names = [g["name"] for g in self.geoms]
        body_names = self.body_names
        for name, elems in tuples.items():
            typ = default.get(name, (0.0, None))[1]
            for objtype, objname, prm in elems:
                idx_list = geom_names if objtype == "geom" else body_names
                idx = idx_list.index(objname)
                arr = custom[name]
                if np.ndim(arr) == 0:
                    size = sizes[objtype]
                    arr = np.repeat(arr, size)
                arr = np.array(arr)
                arr[idx] = prm
                custom[name] = arr
        return custom

    def _contacts(self, geoms: List[Geometry]):
        """Builds typed, stacked contact pairs (reference mjcf.py:207-290)."""

        def convert(geom_a, geom_b):
            # box/mesh pairs run SAT on convex hulls; box against
            # sphere/capsule runs the triangle-mesh narrowphase
            a_box, b_box = type(geom_a) is Box, type(geom_b) is Box
            a_mesh, b_mesh = type(geom_a) is Mesh, type(geom_b) is Mesh
            if a_box and b_box:
                geom_a, geom_b = geom_mesh.box_hull(geom_a), geom_mesh.box_hull(geom_b)
            elif a_box and b_mesh:
                geom_a, geom_b = geom_mesh.box_hull(geom_a), geom_mesh.convex_hull(geom_b)
            elif a_mesh and b_box:
                geom_a, geom_b = geom_mesh.convex_hull(geom_a), geom_mesh.box_hull(geom_b)
            elif a_mesh and b_mesh:
                geom_a, geom_b = geom_mesh.convex_hull(geom_a), geom_mesh.convex_hull(geom_b)
            elif a_box:
                geom_a = geom_mesh.box_tri(geom_a)
            elif b_box:
                geom_b = geom_mesh.box_tri(geom_b)
            # pad convex faces to a common width for stacking
            if isinstance(geom_a, Convex) and isinstance(geom_b, Convex):
                sa, sb = geom_a.face.shape[-1], geom_b.face.shape[-1]
                if sa < sb:
                    geom_a = geom_a.replace(
                        face=np.pad(geom_a.face, ((0, 0), (0, sb - sa)), "edge")
                    )
                elif sb < sa:
                    geom_b = geom_b.replace(
                        face=np.pad(geom_b.face, ((0, 0), (0, sa - sb)), "edge")
                    )
            return geom_a, geom_b

        name_to_geom = {g["name"]: i for i, g in enumerate(self.geoms)}
        pair_list = []
        contact_elem = self.root.find("contact")
        if contact_elem is not None:
            for p in contact_elem.findall("pair"):
                pair_list.append(
                    (name_to_geom[p.get("geom1")], name_to_geom[p.get("geom2")])
                )

        collidables = []
        for key_a, key_b in _COLLIDABLES:
            if self.predefined_pairs:
                geoms_ab = []
                for ia, ib in pair_list:
                    ga, gb = geoms[ia], geoms[ib]
                    ka = (type(ga), ga.link_idx is None)
                    kb = (type(gb), gb.link_idx is None)
                    if (ka, kb) == (key_a, key_b):
                        geoms_ab.append((ga, gb))
                    elif (ka, kb) == (key_b, key_a):
                        geoms_ab.append((gb, ga))
            elif key_a == key_b:
                geoms_a = [
                    g for g in geoms if (type(g), g.link_idx is None) == key_a
                ]
                geoms_ab = list(itertools.combinations(geoms_a, 2))
            else:
                geoms_a = [
                    g for g in geoms if (type(g), g.link_idx is None) == key_a
                ]
                geoms_b = [
                    g for g in geoms if (type(g), g.link_idx is None) == key_b
                ]
                geoms_ab = list(itertools.product(geoms_a, geoms_b))
            if not geoms_ab:
                continue
            geoms_ab = [(a, b) for a, b in geoms_ab if a.link_idx != b.link_idx]
            geoms_ab = [convert(a, b) for a, b in geoms_ab]
            collidables.append(geoms_ab)

        def key_fn(pair):
            def get_key(x):
                if isinstance(x, Convex):
                    return (x.vert.shape, x.face.shape, x.unique_edge.shape)
                if isinstance(x, Mesh):
                    return (x.vert.shape, x.face.shape)
                return -1

            return get_key(pair[0]), get_key(pair[1])

        contacts = []
        for geoms_ab in collidables:
            geoms_ab = sorted(geoms_ab, key=lambda p: str(key_fn(p)))
            for _, grp in itertools.groupby(geoms_ab, key=key_fn):
                geom_a, geom_b = tree_map(lambda *x: np.stack(x), *grp)
                contacts.append((geom_a, geom_b))
        return contacts


def _np_canonical(x) -> np.ndarray:
    """np.asarray with jnp's default-dtype rules (x64 disabled): weak
    float64/int64 inputs narrow to float32/int32 host-side, so the single
    device_put in compile() is semantically identical to per-leaf
    jnp.asarray."""
    a = np.asarray(x)
    if a.dtype == np.float64:
        a = a.astype(np.float32)
    elif a.dtype == np.int64:
        a = a.astype(np.int32)
    elif a.dtype == np.uint64:
        a = a.astype(np.uint32)
    return a


def _compute_invweight(sys: System) -> System:
    """Mean inverse inertia at init_q, from this engine's own mass matrix.

    MuJoCo precomputes body_invweight0/dof_invweight0 during compilation; here
    the same quantities come from one evaluation of the generalized pipeline:
    dof_invweight = diag(M^-1); link invweight = mean translational inverse
    weight of the link frame, trace(J M^-1 J^T) / 3 at the link CoM.
    """
    from brax_tpu.v2 import kinematics
    from brax_tpu.v2.generalized import constraint as gen_constraint
    from brax_tpu.v2.generalized import dynamics as gen_dynamics
    from brax_tpu.v2.generalized import mass as gen_mass
    from brax_tpu.v2.generalized.base import State as GState

    def compute(sys):
        state = GState.zero(sys)
        x, xd = kinematics.forward(sys, sys.init_q, jnp.zeros(sys.qd_size()))
        state = state.replace(q=sys.init_q, qd=jnp.zeros(sys.qd_size()), x=x, xd=xd)
        state = gen_dynamics.transform_com(sys, state)
        mx = gen_mass.matrix(sys, state)
        mx_inv = jax.scipy.linalg.solve(mx, jnp.eye(sys.qd_size()), assume_a="pos")
        dof_invweight = jnp.diag(mx_inv)

        xi = state.x.do(sys.link.inertia.transform)
        link_iw = []
        for i in range(sys.num_links()):
            jac = gen_constraint._pt_jac(
                sys, state.com, state.cdof, xi.pos[i], jnp.asarray(i)
            )  # (nd, 3)
            a = jac.T @ mx_inv @ jac
            link_iw.append(jnp.trace(a) / 3.0)
        return jnp.stack(link_iw), dof_invweight

    with jax.default_device(jax.devices("cpu")[0]):
        link_iw, dof_iw = jax.jit(compute)(sys)
    return sys.replace(
        link=sys.link.replace(invweight=link_iw),
        dof=sys.dof.replace(invweight=dof_iw),
    )


def loads(xml: str, asset_path: Optional[str] = None) -> System:
    """Loads a System from an MJCF XML string."""
    elem = ElementTree.fromstring(xml)
    _fuse_bodies(elem)
    return _Compiler(elem, asset_path).compile()


def load(path: str) -> System:
    """Loads a System from an MJCF file path."""
    with open(path) as f:
        xml = f.read()
    elem = ElementTree.fromstring(xml)
    _fuse_bodies(elem)
    return _Compiler(elem, os.path.dirname(path)).compile()
