"""Native URDF importer: translates URDF robots to v2 Systems.

The reference loads URDF through the mujoco bindings (v2/io/mjcf.py:510-518,
mujoco parses URDF natively); here the URDF tree is translated into MJCF
elements and compiled by the native MJCF compiler, reusing its inertia,
contact-pair, and invweight machinery.

Supported: link inertials (full inertia tensor -> principal frame),
collision geometries (box/sphere/cylinder-as-capsule/mesh STL+OBJ),
revolute/continuous/prismatic/fixed/floating joints with origins, axes and
limits.  The root link gets a free joint (floating base), matching how
physics engines mobilize URDF robots.
"""

from __future__ import annotations

import os
from typing import Dict, Optional
from xml.etree import ElementTree

import numpy as np

from brax_tpu.v2 import mjcf
from brax_tpu.v2.base import System


def _rpy_to_quat(rpy: np.ndarray) -> np.ndarray:
    """URDF rpy = extrinsic x-y-z rotations in radians."""
    return mjcf._euler_to_quat_deg(rpy, degrees=False)


def load_obj(data: bytes, scale: np.ndarray):
    """Minimal OBJ parser: v/f records, polygon faces fan-triangulated."""
    verts, faces = [], []
    for line in data.decode("utf-8", "ignore").splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = [int(p.split("/")[0]) - 1 for p in parts[1:]]
            for k in range(1, len(idx) - 1):
                faces.append([idx[0], idx[k], idx[k + 1]])
    return np.array(verts) * scale, np.array(faces)


def _fmt(a) -> str:
    return " ".join("%.9g" % float(x) for x in np.atleast_1d(a))


class _UrdfTranslator:
    def __init__(self, root: ElementTree.Element, asset_path: Optional[str]):
        self.root = root
        self.asset_path = asset_path or "."
        self.meshes: Dict[str, tuple] = {}

        comp = root.find("mujoco/compiler")
        self.meshdir = comp.get("meshdir", "") if comp is not None else ""

        self.links = {l.get("name"): l for l in root.findall("link")}
        self.joints = list(root.findall("joint"))
        self.children = {}  # parent link name -> [(joint, child link name)]
        child_names = set()
        for j in self.joints:
            p = j.find("parent").get("link")
            c = j.find("child").get("link")
            self.children.setdefault(p, []).append((j, c))
            child_names.add(c)
        roots = [n for n in self.links if n not in child_names]
        if len(roots) != 1:
            raise ValueError(f"expected one root link, got {roots}")
        self.root_link = roots[0]

    def _load_mesh(self, fname: str, scale: np.ndarray):
        key = (fname, tuple(scale))
        if key in self.meshes:
            return self.meshes[key][0]
        path = os.path.join(self.asset_path, self.meshdir, fname)
        with open(path, "rb") as f:
            data = f.read()
        if fname.lower().endswith(".stl"):
            vert, face = mjcf.load_stl(data, scale)
        else:
            vert, face = load_obj(data, scale)
        name = f"m{len(self.meshes)}"
        self.meshes[key] = (name, vert, face)
        return name

    def _geom_elems(self, link, mj_body: ElementTree.Element, link_name: str,
                    off_pos: np.ndarray, off_quat: np.ndarray):
        for ci, col in enumerate(link.findall("collision")):
            origin = col.find("origin")
            xyz = np.fromstring(
                origin.get("xyz", "0 0 0") if origin is not None else "0 0 0",
                sep=" ",
            )
            rpy = np.fromstring(
                origin.get("rpy", "0 0 0") if origin is not None else "0 0 0",
                sep=" ",
            )
            # compose any fixed-joint offset accumulated while fusing
            quat = mjcf._quat_mul(off_quat, _rpy_to_quat(rpy))
            xyz = off_pos + mjcf._quat_rotate(xyz, off_quat)
            geometry = col.find("geometry")
            geom = ElementTree.SubElement(mj_body, "geom")
            geom.set("name", f"{link_name}_c{ci}")
            geom.set("pos", _fmt(xyz))
            geom.set("quat", _fmt(quat))
            # mass comes from <inertial>; URDF collision geoms are massless
            geom.set("mass", "0")
            box = geometry.find("box")
            sphere = geometry.find("sphere")
            cylinder = geometry.find("cylinder")
            mesh = geometry.find("mesh")
            if box is not None:
                size = np.fromstring(box.get("size"), sep=" ") / 2
                geom.set("type", "box")
                geom.set("size", _fmt(size))
            elif sphere is not None:
                geom.set("type", "sphere")
                geom.set("size", sphere.get("radius"))
            elif cylinder is not None:
                # approximate cylinders with capsules (native shape support)
                r = float(cylinder.get("radius"))
                length = float(cylinder.get("length"))
                geom.set("type", "capsule")
                geom.set("size", _fmt([r, max(length / 2 - r, 1e-4)]))
            elif mesh is not None:
                scale = np.fromstring(mesh.get("scale", "1 1 1"), sep=" ")
                mname = self._load_mesh(mesh.get("filename"), scale)
                geom.set("type", "mesh")
                geom.set("mesh", mname)
            else:
                raise NotImplementedError("unknown URDF geometry")

    @staticmethod
    def _read_inertial(link, off_pos: np.ndarray, off_quat: np.ndarray):
        """Returns (mass, com world-of-body pos, 3x3 inertia in body frame)."""
        inertial = link.find("inertial")
        if inertial is None:
            return None
        origin = inertial.find("origin")
        xyz = np.fromstring(
            origin.get("xyz", "0 0 0") if origin is not None else "0 0 0", sep=" "
        )
        rpy = np.fromstring(
            origin.get("rpy", "0 0 0") if origin is not None else "0 0 0", sep=" "
        )
        mass = float(inertial.find("mass").get("value"))
        it = inertial.find("inertia")
        full = np.array(
            [
                [float(it.get("ixx")), float(it.get("ixy", 0)), float(it.get("ixz", 0))],
                [float(it.get("ixy", 0)), float(it.get("iyy")), float(it.get("iyz", 0))],
                [float(it.get("ixz", 0)), float(it.get("iyz", 0)), float(it.get("izz"))],
            ]
        )
        r_local = mjcf._quat_to_mat(_rpy_to_quat(rpy))
        r_off = mjcf._quat_to_mat(off_quat)
        i_body = r_off @ r_local @ full @ r_local.T @ r_off.T
        com = off_pos + r_off @ xyz
        return mass, com, i_body

    @staticmethod
    def _emit_inertial(mj_body: ElementTree.Element, parts):
        """Merges (mass, com, I) parts and emits one <inertial> element."""
        parts = [p for p in parts if p is not None]
        if not parts:
            return
        total_m = sum(p[0] for p in parts)
        com = sum(p[0] * p[1] for p in parts) / total_m
        itot = np.zeros((3, 3))
        for m, c, i in parts:
            d = c - com
            itot += i + m * ((d @ d) * np.eye(3) - np.outer(d, d))
        evals, evecs = np.linalg.eigh(itot)
        order = np.argsort(evals)[::-1]
        evals, evecs = evals[order], evecs[:, order]
        if np.linalg.det(evecs) < 0:
            evecs[:, 2] *= -1
        w = np.sqrt(max(1 + np.trace(evecs), 1e-12)) / 2
        quat = np.array(
            [
                w,
                (evecs[2, 1] - evecs[1, 2]) / (4 * w),
                (evecs[0, 2] - evecs[2, 0]) / (4 * w),
                (evecs[1, 0] - evecs[0, 1]) / (4 * w),
            ]
        )
        quat /= np.linalg.norm(quat)
        el = ElementTree.SubElement(mj_body, "inertial")
        el.set("pos", _fmt(com))
        el.set("quat", _fmt(quat))
        el.set("mass", "%.9g" % total_m)
        el.set("diaginertia", _fmt(np.maximum(evals, 1e-9)))

    @staticmethod
    def _joint_origin(joint):
        origin = joint.find("origin")
        xyz = np.fromstring(
            origin.get("xyz", "0 0 0") if origin is not None else "0 0 0", sep=" "
        )
        rpy = np.fromstring(
            origin.get("rpy", "0 0 0") if origin is not None else "0 0 0", sep=" "
        )
        return xyz, _rpy_to_quat(rpy)

    def _fill_body(self, link_name: str, body: ElementTree.Element,
                   off_pos: np.ndarray, off_quat: np.ndarray, parts: list):
        """Adds a link's geoms/inertia to `body` (offset by any fused fixed
        joints), then recurses: fixed children fuse in, mobile children
        become nested bodies."""
        link = self.links[link_name]
        parts.append(self._read_inertial(link, off_pos, off_quat))
        self._geom_elems(link, body, link_name, off_pos, off_quat)
        for child_joint, child_name in self.children.get(link_name, []):
            jtype = child_joint.get("type")
            j_pos, j_quat = self._joint_origin(child_joint)
            if jtype == "fixed":
                c_pos = off_pos + mjcf._quat_rotate(j_pos, off_quat)
                c_quat = mjcf._quat_mul(off_quat, j_quat)
                self._fill_body(child_name, body, c_pos, c_quat, parts)
            else:
                self._walk(child_name, body, child_joint)

    def _walk(self, link_name: str, mj_parent: ElementTree.Element,
              joint: Optional[ElementTree.Element]):
        body = ElementTree.SubElement(mj_parent, "body")
        body.set("name", link_name)

        if joint is None:
            body.set("pos", "0 0 0")
            j = ElementTree.SubElement(body, "joint")
            j.set("name", f"{link_name}_free")
            j.set("type", "free")
        else:
            xyz, quat = self._joint_origin(joint)
            body.set("pos", _fmt(xyz))
            body.set("quat", _fmt(quat))
            jtype = joint.get("type")
            j = ElementTree.SubElement(body, "joint")
            j.set("name", joint.get("name"))
            axis = joint.find("axis")
            j.set("axis", axis.get("xyz") if axis is not None else "1 0 0")
            limit = joint.find("limit")
            if jtype in ("revolute", "continuous"):
                j.set("type", "hinge")
            elif jtype == "prismatic":
                j.set("type", "slide")
            elif jtype == "floating":
                j.set("type", "free")
            else:
                raise NotImplementedError(f"joint type {jtype}")
            if limit is not None and jtype in ("revolute", "prismatic"):
                lo, hi = limit.get("lower"), limit.get("upper")
                if lo is not None and hi is not None:
                    j.set("limited", "true")
                    j.set("range", f"{lo} {hi}")
            dynamics = joint.find("dynamics")
            if dynamics is not None:
                j.set("damping", dynamics.get("damping", "0"))

        parts: list = []
        self._fill_body(link_name, body, np.zeros(3), np.array([1.0, 0, 0, 0]), parts)
        self._emit_inertial(body, parts)

    def translate(self) -> ElementTree.Element:
        mj = ElementTree.Element("mujoco")
        mj.set("model", self.root.get("name", "urdf"))
        comp = ElementTree.SubElement(mj, "compiler")
        comp.set("angle", "radian")
        comp.set("inertiafromgeom", "false")
        world = ElementTree.SubElement(mj, "worldbody")
        self._walk(self.root_link, world, None)
        return mj


def loads(xml: str, asset_path: Optional[str] = None) -> System:
    """Loads a v2 System from a URDF string."""
    root = ElementTree.fromstring(xml)
    tr = _UrdfTranslator(root, asset_path)
    mj_elem = tr.translate()
    mjcf._fuse_bodies(mj_elem)
    compiler = mjcf._Compiler(mj_elem, asset_path)
    # inject pre-loaded meshes (bypasses the compiler's file loader)
    for (fname, scale), (name, vert, face) in tr.meshes.items():
        compiler.meshes[name] = (vert, face)
    return compiler.compile()


def load(path: str) -> System:
    """Loads a v2 System from a URDF file path."""
    with open(path) as f:
        xml = f.read()
    return loads(xml, os.path.dirname(path))
