"""Compiles a scene `Config` into a dense `System`.

This replaces the reference's trace-time object graph (brax/physics/system.py
__init__ + colliders.get/joints.get/actuators.get) with a build step that
emits padded dense arrays: joint groups keyed by DOF, actuator groups keyed by
(kind, dof), and contact groups as static typed pair tables.

All heavy math here runs once in float64 numpy and is cast to float32, so
trace time is trivial and XLA sees pure constants for all topology.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as onp

from brax_tpu.sim import actuators as actuators_mod
from brax_tpu.sim import colliders as colliders_mod
from brax_tpu.sim import config as cfg
from brax_tpu.sim import geometry
from brax_tpu.sim import joints as joints_mod
from brax_tpu.sim.integrator import Integrator
from brax_tpu.sim.system import System
from brax_tpu.sim.types import HArray

import jax


# ---------------------------------------------------------------------------
# numpy euler/rotation helpers (build-time, float64)
# ---------------------------------------------------------------------------

def _np_euler_to_quat(v) -> onp.ndarray:
    v = onp.asarray(v, dtype=onp.float64)
    c1, c2, c3 = onp.cos(v * onp.pi / 360)
    s1, s2, s3 = onp.sin(v * onp.pi / 360)
    return onp.array([
        c1 * c2 * c3 - s1 * s2 * s3,
        s1 * c2 * c3 + c1 * s2 * s3,
        c1 * s2 * c3 - s1 * c2 * s3,
        c1 * c2 * s3 + s1 * s2 * c3,
    ])


def _np_rotate(vec, quat) -> onp.ndarray:
    vec = onp.asarray(vec, dtype=onp.float64)
    s, u = quat[0], quat[1:]
    r = 2 * (onp.dot(u, vec) * u) + (s * s - onp.dot(u, u)) * vec
    return r + 2 * s * onp.cross(u, vec)


def _np_rotate_rows(mat, quat) -> onp.ndarray:
    return onp.stack([_np_rotate(row, quat) for row in onp.asarray(mat, dtype=onp.float64)])


def _f32(x) -> onp.ndarray:
    # host-side float32: leaves stay numpy through the whole build and move
    # to the device in ONE batched jax.device_put at the end of build() —
    # eager per-leaf jnp.asarray costs a blocking RPC per leaf on a
    # tunnel-remote TPU (~5s of the cold start for ant's 31 leaves)
    return onp.asarray(onp.asarray(x, dtype=onp.float64), dtype=onp.float32)


# ---------------------------------------------------------------------------
# build artifacts (static helper data the System itself doesn't need)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class BuildArtifacts:
    config: cfg.Config  # validated + sphericalized
    body_index: Dict[str, int]
    joint_order: List[str]  # joint names in group-application order
    action_size: int


def build(config: cfg.Config) -> Tuple[System, BuildArtifacts]:
    config = cfg.validate(config)

    nb = len(config.bodies)
    body_index = {b.name: i for i, b in enumerate(config.bodies)}
    mass = onp.array([b.mass for b in config.bodies], dtype=onp.float64)
    inv_inertia = 1.0 / onp.array([b.inertia for b in config.bodies], dtype=onp.float64)
    active = onp.array([0.0 if b.frozen.all else 1.0 for b in config.bodies])

    num_joint_dof = sum(len(j.angle_limits) for j in config.joints)

    # --- joints (mutates config joints for sphericalization, like the ref) ---
    joint_groups, joint_order, group_of_joint, index_in_group = _build_joints(
        config, body_index, mass, inv_inertia
    )

    # --- actuators ---
    actuator_groups = _build_actuators(config, joint_groups, group_of_joint, index_in_group)

    # --- forces ---
    force_groups = _build_forces(config, body_index, mass)
    num_forces_dof = sum(3 for _ in config.forces)

    # --- contacts ---
    contact_groups, num_contacts = build_contact_groups(config, body_index, mass, inv_inertia)

    # --- integrator ---
    pos_mask = 1.0 - onp.array([b.frozen.position for b in config.bodies])
    rot_mask = 1.0 - onp.array([b.frozen.rotation for b in config.bodies])
    quat_mask = 1.0 - onp.array(
        [[0.0] + list(b.frozen.rotation) for b in config.bodies]
    )
    integrator = Integrator(
        pos_mask=_f32(pos_mask),
        rot_mask=_f32(rot_mask),
        quat_mask=_f32(quat_mask),
        dt=float(config.dt) / int(config.substeps),
        gravity=_f32(config.gravity),
        velocity_damping=float(config.velocity_damping),
        angular_damping=float(config.angular_damping),
    )

    h = config.dt / config.substeps
    solver = colliders_mod.SolverParams(
        baumgarte_erp=float(config.baumgarte_erp * config.substeps / config.dt),
        h=float(h),
        collide_scale=float(config.solver_scale_collide),
        velocity_threshold=float(onp.linalg.norm(onp.array(config.gravity)) * h * 4.0),
    )

    sys = System(
        num_bodies=nb,
        num_joints=len(config.joints),
        num_joint_dof=num_joint_dof,
        num_actuators=len(config.actuators),
        num_forces_dof=num_forces_dof,
        substeps=int(config.substeps),
        dynamics_mode=config.dynamics_mode,
        num_contacts=num_contacts,
        collider_cutoff=int(config.collider_cutoff),
        mass=_f32(mass),
        inv_inertia=_f32(inv_inertia),
        active=_f32(active),
        integrator=integrator,
        solver=solver,
        joint_groups=tuple(joint_groups),
        actuator_groups=tuple(actuator_groups),
        force_groups=tuple(force_groups),
        contact_groups=tuple(contact_groups),
    )
    art = BuildArtifacts(
        config=config,
        body_index=body_index,
        joint_order=joint_order,
        action_size=num_joint_dof + num_forces_dof,
    )
    # single batched transfer of every leaf (see _f32)
    sys = jax.device_put(sys)
    return sys, art


# ---------------------------------------------------------------------------
# joints
# ---------------------------------------------------------------------------

def _joint_frames(j: cfg.Joint):
    """axis_c / axis_p construction (reference joints.py:67-75)."""
    rot_q = _np_euler_to_quat(j.rotation)
    ref_q = _np_euler_to_quat(j.reference_rotation)
    axis_c = _np_rotate_rows(onp.eye(3), rot_q)
    axis_p = _np_rotate_rows(axis_c, ref_q)
    return axis_c, axis_p


def _make_joint_group(
    kind: str,
    dof: int,
    joints: List[cfg.Joint],
    free_dofs,
    body_index,
    mass,
    inv_inertia,
    scale_pos: float,
    scale_ang: float,
    spring_damping_coeff: float = 2.0,
) -> joints_mod.JointGroup:
    parent = onp.array([body_index[j.parent] for j in joints], dtype=onp.int32)
    child = onp.array([body_index[j.child] for j in joints], dtype=onp.int32)
    axis_cp = [_joint_frames(j) for j in joints]
    limit = onp.array(
        [[[lo, hi] for (lo, hi) in j.angle_limits] for j in joints], dtype=onp.float64
    ) / 180.0 * onp.pi
    spring_damping = onp.array(
        [
            j.spring_damping
            if j.spring_damping is not None
            else spring_damping_coeff * onp.sqrt(j.stiffness)
            for j in joints
        ]
    )
    limit_strength = onp.array(
        [j.limit_strength if j.limit_strength is not None else j.stiffness for j in joints]
    )
    return joints_mod.JointGroup(
        kind=kind,
        dof=dof,
        parent=HArray(parent),
        child=HArray(child),
        free_dofs=tuple(free_dofs) if free_dofs is not None else None,
        off_p=_f32([j.parent_offset for j in joints]),
        off_c=_f32([j.child_offset for j in joints]),
        limit=_f32(limit),
        axis_c=_f32([ac for ac, _ in axis_cp]),
        axis_p=_f32([ap for _, ap in axis_cp]),
        angular_damping=_f32([j.angular_damping for j in joints]),
        scale_pos=_f32([scale_pos] * len(joints)),
        scale_ang=_f32([scale_ang] * len(joints)),
        mass_p=_f32(mass[parent]),
        mass_c=_f32(mass[child]),
        inertia_p=_f32(inv_inertia[parent]),
        inertia_c=_f32(inv_inertia[child]),
        stiffness=_f32([j.stiffness for j in joints]),
        spring_damping=_f32(spring_damping),
        limit_strength=_f32(limit_strength),
    )


def _build_joints(config, body_index, mass, inv_inertia):
    """Groups joints by dof; sphericalizes mixed-dof PBD systems.

    Parity: brax/physics/joints.py:418-474 and spring_joints.py:306-331.
    """
    groups: List[joints_mod.JointGroup] = []
    joint_order: List[str] = []
    group_of_joint: Dict[str, int] = {}
    index_in_group: Dict[str, int] = {}

    if config.dynamics_mode == "pbd":
        dofs = {len(j.angle_limits) for j in config.joints}
        sphericalize = len(dofs) > 1 or 2 in dofs
        by_dof: Dict[int, Dict[str, list]] = {}
        for joint in config.joints:
            dof = len(joint.angle_limits)
            free = dof
            while sphericalize and dof < 3:
                joint.angle_limits.append((0.0, 0.0))
                dof += 1
            by_dof.setdefault(dof, {"joint": [], "free_dofs": []})
            by_dof[dof]["joint"].append(joint)
            by_dof[dof]["free_dofs"].append(free)

        scale_pos = config.solver_scale_pos or 0.6
        scale_ang = config.solver_scale_ang or 0.2

        for dof, v in sorted(by_dof.items()):
            if dof == 1:
                kind, free = "revolute", None
            elif dof == 2:
                kind, free = "spherical", None
            elif dof == 3:
                kind, free = "spherical", v["free_dofs"]
            else:
                raise RuntimeError(f"invalid number of joint limits: {dof}")
            g = _make_joint_group(
                kind, dof, v["joint"], free, body_index, mass, inv_inertia,
                scale_pos, scale_ang,
            )
            gi = len(groups)
            groups.append(g)
            for k, j in enumerate(v["joint"]):
                joint_order.append(j.name)
                group_of_joint[j.name] = gi
                index_in_group[j.name] = k
    else:
        by_dof: Dict[int, List[cfg.Joint]] = {}
        for joint in config.joints:
            if joint.stiffness > 0:
                by_dof.setdefault(len(joint.angle_limits), []).append(joint)
        kind_of = {1: "spring_revolute", 2: "spring_universal", 3: "spring_spherical"}
        coeff_of = {1: 0.5, 2: 2.0, 3: 2.0}
        for dof, js in sorted(by_dof.items()):
            g = _make_joint_group(
                kind_of[dof], dof, js, None, body_index, mass, inv_inertia,
                0.6, 0.2, spring_damping_coeff=coeff_of[dof],
            )
            gi = len(groups)
            groups.append(g)
            for k, j in enumerate(js):
                joint_order.append(j.name)
                group_of_joint[j.name] = gi
                index_in_group[j.name] = k

    return groups, joint_order, group_of_joint, index_in_group


# ---------------------------------------------------------------------------
# actuators & forces
# ---------------------------------------------------------------------------

def _build_actuators(config, joint_groups, group_of_joint, index_in_group):
    """Parity: brax/physics/actuators.py:115-164 (act-index packing)."""
    actuators: Dict[tuple, list] = {}
    current_index = 0
    for actuator in config.actuators:
        if actuator.joint not in group_of_joint:
            raise RuntimeError(f"joint not found: {actuator.joint}")
        gi = group_of_joint[actuator.joint]
        g = joint_groups[gi]
        ji = index_in_group[actuator.joint]
        if g.free_dofs is not None:
            free = g.free_dofs[ji]
            act_index = tuple(
                i if i - current_index < free else -1
                for i in range(current_index, current_index + g.dof)
            )
            current_index += free
        else:
            act_index = tuple(range(current_index, current_index + g.dof))
            current_index += g.dof
        key = (actuator.kind, g.dof, gi)
        actuators.setdefault(key, []).append((actuator, ji, act_index))

    groups = []
    for (kind, dof, gi), items in sorted(actuators.items()):
        groups.append(
            actuators_mod.ActuatorGroup(
                kind=kind,
                group_index=gi,
                joint_sel=HArray(onp.array([ji for _, ji, _ in items], dtype=onp.int32)),
                act_index=HArray(onp.array([ai for _, _, ai in items], dtype=onp.int32)),
                strength=_f32([a.strength for a, _, _ in items]),
            )
        )
    return groups


def _build_forces(config, body_index, mass):
    """Parity: brax/physics/forces.py:110-138 (force act indices follow actuators)."""
    dofs = {j.name: len(j.angle_limits) for j in config.joints}
    current_index = sum(dofs[a.joint] for a in config.actuators)

    thrusters, thr_idx, twisters, twi_idx = [], [], [], []
    for f in config.forces:
        act_index = tuple(range(current_index, current_index + 3))
        current_index += 3
        if f.kind == "thruster":
            thrusters.append(f)
            thr_idx.append(act_index)
        elif f.kind == "twister":
            twisters.append(f)
            twi_idx.append(act_index)
        else:
            raise ValueError(f"unknown force kind: {f.kind}")

    groups = []
    for kind, fs, idx in (("thruster", thrusters, thr_idx), ("twister", twisters, twi_idx)):
        if not fs:
            continue
        body = onp.array([body_index[f.body] for f in fs], dtype=onp.int32)
        groups.append(
            actuators_mod.ForceGroup(
                kind=kind,
                body=HArray(body),
                act_index=HArray(onp.array(idx, dtype=onp.int32)),
                strength=_f32([f.strength for f in fs]),
                mass=_f32(mass[body]),
            )
        )
    return groups


# ---------------------------------------------------------------------------
# contact pair tables
# ---------------------------------------------------------------------------

def _capsule_axis_seg(col: cfg.Collider):
    axis = _np_rotate(onp.array([0.0, 0.0, 1.0]), _np_euler_to_quat(col.rotation))
    seg = col.capsule.length * 0.5 - col.capsule.radius
    return axis, seg


def _capsule_ends(col: cfg.Collider) -> List[onp.ndarray]:
    """Cap sphere centers incl. collider offset (geometry.py:262-288)."""
    axis, seg = _capsule_axis_seg(col)
    pos = onp.asarray(col.position, dtype=onp.float64)
    ends = [col.capsule.end] if col.capsule.end else [-1, 1]
    return [pos + e * axis * seg for e in ends]


def _box_corners(col: cfg.Collider) -> onp.ndarray:
    rot = _np_euler_to_quat(col.rotation)
    corners = geometry.BOX_CORNERS * onp.asarray(col.box.halfsize, dtype=onp.float64)
    corners = onp.stack([_np_rotate(c, rot) for c in corners])
    return corners + onp.asarray(col.position, dtype=onp.float64)


def _fix_winding(faces: onp.ndarray, normals: onp.ndarray) -> onp.ndarray:
    """Enforce clockwise winding (reference geometry.py:148-155)."""
    out = []
    for face, normal in zip(faces, normals):
        w = onp.dot(onp.cross(face[0] - face[-1], face[0] - face[1]), normal) >= 0
        out.append(face if w else face[::-1])
    return onp.stack(out)


def _triangulated_box(col: cfg.Collider):
    rot = _np_euler_to_quat(col.rotation)
    vertex = geometry.BOX_CORNERS * onp.asarray(col.box.halfsize, dtype=onp.float64)
    vertex = onp.stack([_np_rotate(v, rot) for v in vertex])
    vertex = vertex + onp.asarray(col.position, dtype=onp.float64)
    normals = onp.stack([
        _np_rotate(n, rot) for n in geometry.TRIANGULATED_BOX_FACE_NORMALS
    ])
    faces = vertex[geometry.TRIANGULATED_BOX_FACES].reshape(-1, 3, 3)
    faces = _fix_winding(faces, normals)
    return vertex, faces, normals


def _mesh_geom(col: cfg.Collider, mesh_geoms: Dict[str, cfg.MeshGeometry]):
    g = mesh_geoms[col.mesh.name]
    rot = _np_euler_to_quat(col.rotation)
    scale = col.mesh.scale if col.mesh.scale else 1.0
    verts = onp.asarray(g.vertices, dtype=onp.float64) * scale
    verts = onp.stack([_np_rotate(v, rot) for v in verts])
    verts = verts + onp.asarray(col.position, dtype=onp.float64)
    faces = verts[onp.asarray(g.faces, dtype=onp.int64)].reshape(-1, 3, 3)
    normals = onp.stack([_np_rotate(n, rot) for n in onp.asarray(g.face_normals, dtype=onp.float64)])
    faces = _fix_winding(faces, normals)
    return verts, faces, normals


def build_contact_groups(config: cfg.Config, body_index, mass, inv_inertia):
    """Builds static typed contact pair tables.

    Parity: brax/physics/colliders.py:891-1023 (pair filtering rules:
    collide_include allowlist, dedup, no self-collision, no frozen-frozen,
    joint parent/child exclusion, one-way split on frozen second body).
    """
    mesh_geoms = {m.name: m for m in config.mesh_geometries}

    cols = []
    for b in config.bodies:
        for c_idx, c in enumerate(b.colliders):
            if c.no_contact:
                continue
            if c.sphere is not None:
                c = copy.deepcopy(c)
                c.capsule = cfg.Capsule(
                    radius=c.sphere.radius, length=2 * c.sphere.radius, end=1
                )
                c.sphere = None
            cols.append((c, b, c_idx))

    include = {(a, b) for a, b in config.collide_include}
    parents = {(j.parent, j.child) for j in config.joints}

    # (type_a, type_b) -> group factory; insertion order defines application
    # order, mirroring the reference collider_pairs dict order.
    pair_types = [
        ("box", "plane"),
        ("box", "heightmap"),
        ("capsule", "box"),
        ("capsule", "plane"),
        ("capsule", "capsule"),
        ("capsule", "mesh"),
        ("capsule", "clipped_plane"),
        ("mesh", "plane"),
        ("box", "box"),
    ]

    unique_meshes = sorted({c.mesh.name for c, _, _ in cols if c.mesh is not None})

    groups = []
    num_contacts = 0

    for type_a, type_b in pair_types:
        replicas = unique_meshes if "mesh" in (type_a, type_b) else [None]
        for mesh_name in replicas:
            cols_a = [
                (c, b, ci) for c, b, ci in cols
                if c.kind() == type_a and (type_a != "mesh" or c.mesh.name == mesh_name)
            ]
            cols_b = [
                (c, b, ci) for c, b, ci in cols
                if c.kind() == type_b and (type_b != "mesh" or c.mesh.name == mesh_name)
            ]
            cols_a = [(c, b, ci) for c, b, ci in cols_a if not b.frozen.all]

            cols_ab = []
            pair_count = {}
            for ca, ba, ca_idx in cols_a:
                for cb, bb, cb_idx in cols_b:
                    included = (ba.name, bb.name) in include or (bb.name, ba.name) in include
                    if (ba.name, ca_idx, bb.name, cb_idx) in pair_count:
                        continue
                    if ba.name == bb.name:
                        continue
                    if ba.frozen.all and bb.frozen.all:
                        continue
                    # NB: mirrors the reference's operator precedence
                    # (colliders.py:966-968): a (parent, child) ordered pair is
                    # always skipped; a (child, parent) one only when not included.
                    if (ba.name, bb.name) in parents or (
                        (bb.name, ba.name) in parents and not included
                    ):
                        continue
                    if ca.no_contact or cb.no_contact:
                        continue
                    if not include or included:
                        cols_ab.append((ca, ca_idx, ba, cb, cb_idx, bb))
                        pair_count[(ba.name, ca_idx, bb.name, cb_idx)] = 1
                        pair_count[(bb.name, cb_idx, ba.name, ca_idx)] = 1

            for b_is_frozen in (True, False):
                sel = [x for x in cols_ab if x[5].frozen.all == b_is_frozen]
                if not sel:
                    continue
                g = _make_contact_group(
                    type_a, type_b, sel, b_is_frozen, body_index, mass, inv_inertia,
                    mesh_geoms,
                )
                if g is None:
                    continue
                groups.append(g)
                num_contacts += _group_contact_count(g)

    return groups, num_contacts


def _group_contact_count(g) -> int:
    """Static (npairs * ncontacts) for a group's manifold."""
    if isinstance(g, (colliders_mod.CapsulePlane, colliders_mod.CapsuleClippedPlane)):
        return g.end.shape[0] * g.end.shape[1]
    if isinstance(g, colliders_mod.CapsuleCapsule):
        return g.end_a.shape[0]
    if isinstance(g, (colliders_mod.BoxPlane, colliders_mod.BoxHeightMap)):
        return g.corner.shape[0] * 8
    if isinstance(g, colliders_mod.MeshPlane):
        return g.vertices.shape[0] * g.vertices.shape[1]
    if isinstance(g, colliders_mod.CapsuleMesh):
        return g.faces.shape[0] * g.faces.shape[1]
    if isinstance(g, colliders_mod.HullHull):
        return g.vert_a.shape[0] * 4  # 4-point SAT manifold per pair
    raise ValueError(f"unknown contact group type: {type(g)}")


def _common(sel, b_is_frozen, body_index, mass, inv_inertia):
    body_a = onp.array([body_index[ba.name] for _, _, ba, _, _, _ in sel], dtype=onp.int32)
    body_b = onp.array([body_index[bb.name] for _, _, _, _, _, bb in sel], dtype=onp.int32)
    fr = onp.array([ca.material.friction * cb.material.friction for ca, _, _, cb, _, _ in sel])
    el = onp.array([ca.material.elasticity * cb.material.elasticity for ca, _, _, cb, _, _ in sel])
    return colliders_mod.GroupCommon(
        body_a=HArray(body_a),
        body_b=HArray(body_b),
        one_way=bool(b_is_frozen),
        friction=_f32(fr),
        elasticity=_f32(el),
        mass_a=_f32(mass[body_a]),
        inertia_a=_f32(inv_inertia[body_a]),
        mass_b=_f32(mass[body_b]),
        inertia_b=_f32(inv_inertia[body_b]),
    )


def _make_contact_group(type_a, type_b, sel, b_is_frozen, body_index, mass,
                        inv_inertia, mesh_geoms):
    com = _common(sel, b_is_frozen, body_index, mass, inv_inertia)
    cas = [ca for ca, _, _, _, _, _ in sel]
    cbs = [cb for _, _, _, cb, _, _ in sel]

    if (type_a, type_b) == ("capsule", "plane"):
        ends = [_capsule_ends(c) for c in cas]
        if len({len(e) for e in ends}) != 1:
            # pad 1-end capsules with a duplicate cap (geometry.py:279-287)
            for e in ends:
                if len(e) == 1:
                    e.append(e[0])
        return colliders_mod.CapsulePlane(
            com=com,
            end=_f32(onp.stack([onp.stack(e) for e in ends])),
            radius=_f32([c.capsule.radius for c in cas]),
        )

    if (type_a, type_b) == ("capsule", "capsule"):
        def parts(colz):
            axis_seg = [_capsule_axis_seg(c) for c in colz]
            end = onp.stack([a * s for a, s in axis_seg])
            off = onp.stack([onp.asarray(c.position, dtype=onp.float64) for c in colz])
            radius = onp.array([c.capsule.radius for c in colz])
            return end, off, radius

        end_a, off_a, rad_a = parts(cas)
        end_b, off_b, rad_b = parts(cbs)
        return colliders_mod.CapsuleCapsule(
            com=com,
            end_a=_f32(end_a), off_a=_f32(off_a), radius_a=_f32(rad_a),
            end_b=_f32(end_b), off_b=_f32(off_b), radius_b=_f32(rad_b),
        )

    if (type_a, type_b) == ("box", "plane"):
        return colliders_mod.BoxPlane(
            com=com, corner=_f32(onp.stack([_box_corners(c) for c in cas]))
        )

    if (type_a, type_b) == ("mesh", "plane"):
        verts = [_mesh_geom(c, mesh_geoms)[0] for c in cas]
        n = max(len(v) for v in verts)
        verts = [onp.pad(v, ((0, n - len(v)), (0, 0))) for v in verts]
        return colliders_mod.MeshPlane(com=com, vertices=_f32(onp.stack(verts)))

    if (type_a, type_b) in (("capsule", "box"), ("capsule", "mesh")):
        axis_seg = [_capsule_axis_seg(c) for c in cas]
        end = onp.stack([a * s for a, s in axis_seg])
        off = onp.stack([onp.asarray(c.position, dtype=onp.float64) for c in cas])
        radius = onp.array([c.capsule.radius for c in cas])
        if type_b == "box":
            fb = [_triangulated_box(c) for c in cbs]
        else:
            fb = [_mesh_geom(c, mesh_geoms) for c in cbs]
        faces = onp.stack([f for _, f, _ in fb])
        normals = onp.stack([n for _, _, n in fb])
        return colliders_mod.CapsuleMesh(
            com=com,
            end=_f32(end), off=_f32(off), radius=_f32(radius),
            faces=_f32(faces), face_normals=_f32(normals),
        )

    if (type_a, type_b) == ("box", "heightmap"):
        heights, cell = [], []
        for c in cbs:
            n = int(onp.sqrt(len(c.heightmap.data)))
            if len(c.heightmap.data) != n * n:
                raise ValueError("height map data length should be a perfect square.")
            heights.append(onp.asarray(c.heightmap.data, dtype=onp.float64).reshape(n, n))
            cell.append(c.heightmap.size / (n - 1))
        return colliders_mod.BoxHeightMap(
            com=com,
            corner=_f32(onp.stack([_box_corners(c) for c in cas])),
            height=_f32(onp.stack(heights)),
            cell_size=_f32(cell),
        )

    if (type_a, type_b) == ("capsule", "clipped_plane"):
        ends = [_capsule_ends(c) for c in cas]
        if len({len(e) for e in ends}) != 1:
            for e in ends:
                if len(e) == 1:
                    e.append(e[0])
        norm, xd, yd, hx, hy, pos = [], [], [], [], [], []
        for c in cbs:
            rot = _np_euler_to_quat(c.rotation)
            norm.append(_np_rotate(onp.array([0.0, 0.0, 1.0]), rot))
            xd.append(_np_rotate(onp.array([1.0, 0.0, 0.0]), rot))
            yd.append(_np_rotate(onp.array([0.0, 1.0, 0.0]), rot))
            hx.append(c.clipped_plane.halfsize_x)
            hy.append(c.clipped_plane.halfsize_y)
            pos.append(onp.asarray(c.position, dtype=onp.float64))
        return colliders_mod.CapsuleClippedPlane(
            com=com,
            end=_f32(onp.stack([onp.stack(e) for e in ends])),
            radius=_f32([c.capsule.radius for c in cas]),
            normal_b=_f32(onp.stack(norm)),
            x_b=_f32(onp.stack(xd)),
            y_b=_f32(onp.stack(yd)),
            halfsize_x=_f32(hx),
            halfsize_y=_f32(hy),
            pos_b=_f32(onp.stack(pos)),
        )

    if (type_a, type_b) == ("box", "box"):
        # SAT hull-hull with quad faces (reference colliders.py:851-888)
        def hull_parts(colz):
            from brax_tpu.v2.geometry import mesh as v2_mesh

            verts, faces, norms, edges = [], [], [], []
            for c in colz:
                v = _box_corners(c)  # offset + rotation baked into vertices
                f_idx = v2_mesh._BOX_FACES
                f = v[f_idx]
                n = onp.cross(f[:, 1] - f[:, 0], f[:, -1] - f[:, 0])
                n = n / onp.linalg.norm(n, axis=1, keepdims=True)
                e_idx = v2_mesh.get_unique_edges(v, f_idx)
                verts.append(v)
                faces.append(f)
                norms.append(n)
                edges.append(v[e_idx])
            return (
                onp.stack(verts), onp.stack(faces),
                onp.stack(norms), onp.stack(edges),
            )

        va, fa, na, ea = hull_parts(cas)
        vb, fb, nb, eb = hull_parts(cbs)
        return colliders_mod.HullHull(
            com=com,
            vert_a=_f32(va), face_a=_f32(fa), norm_a=_f32(na), edge_a=_f32(ea),
            vert_b=_f32(vb), face_b=_f32(fb), norm_b=_f32(nb), edge_b=_f32(eb),
        )

    raise ValueError(f"unsupported contact pair: {type_a}-{type_b}")
