"""Dense contact groups: narrowphase detection + impulse resolution.

Collisions are compiled into static typed pair tables at build time; each
`*Group` holds all pairs of one narrowphase type with a leading (npair,) axis,
and produces a `Contact` manifold of shape (npair, ncontact, ...).  Contact
solving (PBD position/velocity passes + legacy spring impulses) is shared code
over all group types, parameterized by a one-way flag (second body static).

Functional parity with /root/reference/brax/physics/colliders.py:
  - narrowphase fns: colliders.py:661-888
  - OneWayCollider/TwoWayCollider solve passes: colliders.py:264-658
  - scatter + per-body contact averaging: colliders.py:116-240
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as onp
from flax import struct

from brax_tpu import maths
from brax_tpu.maths import dot1, vdot
from brax_tpu.sim import geometry
from brax_tpu.sim import lowering
from brax_tpu.sim.types import DP, DQ, QP, Array, Contact, HArray


@struct.dataclass
class SolverParams:
    """Static global contact-solver parameters (colliders.py:92-114)."""

    baumgarte_erp: float = struct.field(pytree_node=False)
    h: float = struct.field(pytree_node=False)  # dt / substeps
    collide_scale: float = struct.field(pytree_node=False)
    velocity_threshold: float = struct.field(pytree_node=False)


@struct.dataclass
class GroupCommon:
    """Common per-pair physical parameters of a contact group."""

    body_a: HArray = struct.field(pytree_node=False)  # (np,)
    body_b: HArray = struct.field(pytree_node=False)
    one_way: bool = struct.field(pytree_node=False)
    friction: Array = None  # (np,) product of the two colliders' frictions
    elasticity: Array = None  # (np,) product
    mass_a: Array = None  # (np,)
    inertia_a: Array = None  # (np, 3) inverse inertia diag
    mass_b: Array = None
    inertia_b: Array = None
    # set by cull_nearest: traced per-step pair selection overriding the
    # static body index tables (reference NearNeighbors, colliders.py:56-89)
    body_a_dyn: Optional[Array] = None
    body_b_dyn: Optional[Array] = None


@struct.dataclass
class CapsulePlane:
    """Capsule sphere-ends vs infinite +z plane (colliders.py:744-759)."""

    com: GroupCommon
    end: Array = None  # (np, ne, 3) body-local cap centers (incl. collider offset)
    radius: Array = None  # (np,)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        # qp_* fields are (np, ...); contacts dimension ne broadcasts.
        pos_a = qp_a.pos[:, None, :]
        rot_a = qp_a.rot[:, None, :]
        cap_end_world = pos_a + maths.rotate(self.end, rot_a)
        normal = maths.rotate(jnp.array([0.0, 0.0, 1.0]), qp_b.rot)[:, None, :]
        pos = cap_end_world - normal * self.radius[:, None, None]
        vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], pos - pos_a)
        penetration = vdot(qp_b.pos[:, None, :] - pos, normal)
        normal = jnp.broadcast_to(normal, pos.shape)
        return Contact(pos, vel, normal, penetration)


@struct.dataclass
class CapsuleCapsule:
    """Capsule vs capsule, one contact per pair (colliders.py:805-819)."""

    com: GroupCommon
    end_a: Array = None  # (np, 3) axis * segment_length
    off_a: Array = None  # (np, 3) collider position offset
    radius_a: Array = None
    end_b: Array = None
    off_b: Array = None
    radius_b: Array = None

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        def endpoints(end, qp, offset):
            pos = qp.pos + maths.rotate(offset, qp.rot)
            e = maths.rotate(end, qp.rot)
            return pos + e, pos - e

        a0, a1 = endpoints(self.end_a, qp_a, self.off_a)
        b0, b1 = endpoints(self.end_b, qp_b, self.off_b)
        a_best, b_best = geometry.closest_segment_to_segment_points(a0, a1, b0, b1)

        pen_vec = a_best - b_best
        dist = maths.safe_norm(pen_vec)
        normal = pen_vec / (1e-6 + dist[..., None])
        penetration = self.radius_a + self.radius_b - dist
        pos = (a_best + b_best) / 2
        vel = qp_a.world_velocity(pos) - qp_b.world_velocity(pos)
        return Contact(
            pos[:, None, :], vel[:, None, :], normal[:, None, :], penetration[:, None]
        )


@struct.dataclass
class BoxPlane:
    """Box corners vs infinite plane (colliders.py:667-680)."""

    com: GroupCommon
    corner: Array = None  # (np, 8, 3)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        pos_a = qp_a.pos[:, None, :]
        rot_a = qp_a.rot[:, None, :]
        rpos_off = maths.rotate(self.corner, rot_a)
        pos = pos_a + rpos_off
        vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], rpos_off)
        normal = maths.rotate(jnp.array([0.0, 0.0, 1.0]), qp_b.rot)[:, None, :]
        penetration = vdot(qp_b.pos[:, None, :] - pos, normal)
        normal = jnp.broadcast_to(normal, pos.shape)
        return Contact(pos, vel, normal, penetration)


@struct.dataclass
class MeshPlane:
    """Mesh vertices vs infinite plane (colliders.py:683-696)."""

    com: GroupCommon
    vertices: Array = None  # (np, nv, 3)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        pos_a = qp_a.pos[:, None, :]
        rot_a = qp_a.rot[:, None, :]
        rpos_off = maths.rotate(self.vertices, rot_a)
        pos = pos_a + rpos_off
        vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], rpos_off)
        normal = maths.rotate(jnp.array([0.0, 0.0, 1.0]), qp_b.rot)[:, None, :]
        penetration = vdot(qp_b.pos[:, None, :] - pos, normal)
        normal = jnp.broadcast_to(normal, pos.shape)
        return Contact(pos, vel, normal, penetration)


@struct.dataclass
class CapsuleMesh:
    """Capsule segment vs mesh triangles (colliders.py:822-848).

    Also covers capsule-vs-box via triangulated boxes (colliders.py:898-899).
    """

    com: GroupCommon
    end: Array = None  # (np, 3)
    off: Array = None  # (np, 3)
    radius: Array = None  # (np,)
    faces: Array = None  # (np, nf, 3, 3) body-local triangle vertices
    face_normals: Array = None  # (np, nf, 3)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        pos_a = qp_a.pos + maths.rotate(self.off, qp_a.rot)
        e = maths.rotate(self.end, qp_a.rot)
        a = (pos_a + e)[:, None, :]
        b = (pos_a - e)[:, None, :]

        rot_b = qp_b.rot[:, None, None, :]
        pt = qp_b.pos[:, None, None, :] + maths.rotate(self.faces, rot_b)  # (np, nf, 3, 3)
        p0, p1, p2 = pt[..., 0, :], pt[..., 1, :], pt[..., 2, :]
        tri_norm = maths.rotate(self.face_normals, qp_b.rot[:, None, :])

        seg_p, tri_p = geometry.closest_segment_triangle_points(a, b, p0, p1, p2, tri_norm)

        pen_vec = seg_p - tri_p
        dist = maths.safe_norm(pen_vec)
        normal = pen_vec / (1e-6 + dist[..., None])
        penetration = self.radius[:, None] - dist
        pos = tri_p
        vel = (
            qp_a.vel[:, None, :]
            + jnp.cross(qp_a.ang[:, None, :], pos - qp_a.pos[:, None, :])
            - (qp_b.vel[:, None, :] + jnp.cross(qp_b.ang[:, None, :], pos - qp_b.pos[:, None, :]))
        )
        return Contact(pos, vel, normal, penetration)


@struct.dataclass
class BoxHeightMap:
    """Box corners vs height map triangles (colliders.py:699-741)."""

    com: GroupCommon
    corner: Array = None  # (np, 8, 3)
    height: Array = None  # (np, H, W)
    cell_size: Array = None  # (np,)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        pos_a = qp_a.pos[:, None, :]
        rot_a = qp_a.rot[:, None, :]
        rpos_off = maths.rotate(self.corner, rot_a)
        box_pos = pos_a + rpos_off  # (np, 8, 3)
        vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], rpos_off)

        pos = maths.inv_rotate(box_pos - qp_b.pos[:, None, :], qp_b.rot[:, None, :])
        cell = self.cell_size[:, None]  # (np, 1)
        uv_pos = pos[..., :2] / cell[..., None]
        uv_idx = jnp.floor(uv_pos).astype(jnp.int32)
        delta_uv = uv_pos - uv_idx
        lower_triangle = jnp.sum(delta_uv, axis=-1) < 1  # (np, 8)
        mu = jnp.where(lower_triangle, -1, 1)

        lt = lower_triangle[..., None]
        tri_u = uv_idx[..., 0:1] + jnp.where(lt, jnp.array([0, 1, 0]), jnp.array([1, 0, 1]))
        tri_v = uv_idx[..., 1:2] + jnp.where(lt, jnp.array([0, 0, 1]), jnp.array([1, 1, 0]))

        # gather heights: h[k, tri_u, -tri_v] per pair k
        hmap = self.height
        H, W = hmap.shape[-2], hmap.shape[-1]
        u = jnp.clip(tri_u, 0, H - 1)
        v = jnp.mod(-tri_v, W)
        flat = hmap.reshape(hmap.shape[0], -1)  # (np, H*W)
        gidx = u * W + v  # (np, 8, 3)
        h = jnp.take_along_axis(flat[:, None, :], gidx, axis=-1)  # broadcasting gather

        raw_normal = jnp.stack(
            [mu * (h[..., 1] - h[..., 0]), mu * (h[..., 2] - h[..., 0]),
             jnp.broadcast_to(cell, mu.shape)], axis=-1)
        normal = raw_normal / maths.safe_norm(raw_normal)[..., None]
        p0 = jnp.stack(
            [tri_u[..., 0] * cell, tri_v[..., 0] * cell, h[..., 0]], axis=-1)
        penetration = vdot(p0 - pos, normal)
        normal = maths.rotate(normal, qp_b.rot[:, None, :])
        return Contact(box_pos, vel, normal, penetration)


@struct.dataclass
class CapsuleClippedPlane:
    """Capsule ends vs clipped plane (colliders.py:762-802)."""

    com: GroupCommon
    end: Array = None  # (np, ne, 3)
    radius: Array = None  # (np,)
    normal_b: Array = None  # (np, 3) plane normal (body-local)
    x_b: Array = None  # (np, 3)
    y_b: Array = None
    halfsize_x: Array = None  # (np,)
    halfsize_y: Array = None
    pos_b: Array = None  # (np, 3)

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        pos_a = qp_a.pos[:, None, :]
        rot_a = qp_a.rot[:, None, :]
        cap_end_world = pos_a + maths.rotate(self.end, rot_a)
        normal = maths.rotate(self.normal_b, qp_b.rot)[:, None, :]  # (np, 1, 3)

        normal_dir = jnp.where(vdot(qp_a.pos, maths.rotate(self.normal_b, qp_b.rot)) > 0.0, 1.0, -1.0)
        normal = normal * normal_dir[:, None, None]

        pos = cap_end_world - normal * self.radius[:, None, None]
        vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], pos - pos_a)
        plane_pt = (maths.rotate(self.pos_b, qp_b.rot) + qp_b.pos)[:, None, :]
        penetration = vdot(plane_pt - pos, normal)

        norm_x = maths.rotate(self.x_b, qp_b.rot)[:, None, :]
        norm_y = maths.rotate(self.y_b, qp_b.rot)[:, None, :]
        hx = self.halfsize_x[:, None, None]
        hy = self.halfsize_y[:, None, None]
        side_pts = jnp.stack(
            [
                plane_pt + norm_x * hx,
                plane_pt - norm_x * hx,
                plane_pt + norm_y * hy,
                plane_pt - norm_y * hy,
            ],
            axis=-2,
        )  # (np, 1, 4, 3)
        base_n = normal * normal_dir[:, None, None]
        yn = jnp.cross(base_n, norm_x)
        xn = -jnp.cross(base_n, norm_y)
        side_norms = jnp.stack([xn, -xn, yn, -yn], axis=-2)  # (np, 1, 4, 3)
        in_front = vdot(pos[..., None, :] - side_pts, side_norms) > 1e-6  # (np, ne, 4)
        penetration = jnp.where(
            jnp.any(in_front, axis=-1), -jnp.ones_like(penetration), penetration
        )
        normal = jnp.broadcast_to(normal, pos.shape)
        return Contact(pos, vel, normal, penetration)


@struct.dataclass
class HullHull:
    """Convex hull vs convex hull via SAT with a 4-point manifold.

    Covers box-box (reference colliders.py:851-888 / geometry.py:769-841).
    The separating-axis test itself is shared with the v2 engine
    (brax_tpu.v2.geometry.math.sat_hull_hull); hull data is body-local and
    moved to world per step.
    """

    com: GroupCommon
    vert_a: Array = None  # (np, nv, 3) body-local (collider offset baked in)
    face_a: Array = None  # (np, nf, fv, 3)
    norm_a: Array = None  # (np, nf, 3)
    edge_a: Array = None  # (np, ne, 2, 3) unique edge endpoints
    vert_b: Array = None
    face_b: Array = None
    norm_b: Array = None
    edge_b: Array = None

    def contact(self, qp_a: QP, qp_b: QP) -> Contact:
        from brax_tpu.v2.geometry import math as v2_geom_math

        def one(qp_a, qp_b, vert_a, face_a, norm_a, edge_a,
                vert_b, face_b, norm_b, edge_b):
            def to_world(qp, vert, face, norm, edge):
                vert = qp.pos + maths.rotate(vert, qp.rot[None])
                face = qp.pos + maths.rotate(face, qp.rot[None, None])
                norm = maths.rotate(norm, qp.rot[None])
                edge = qp.pos + maths.rotate(edge, qp.rot[None, None])
                return vert, face, norm, edge

            va, fa, na, ea = to_world(qp_a, vert_a, face_a, norm_a, edge_a)
            vb, fb, nb, eb = to_world(qp_b, vert_b, face_b, norm_b, edge_b)
            c = v2_geom_math.sat_hull_hull(fa, fb, va, vb, na, nb, ea, eb)
            vel = (
                qp_a.vel + jnp.cross(qp_a.ang, c.pos - qp_a.pos)
                - (qp_b.vel + jnp.cross(qp_b.ang, c.pos - qp_b.pos))
            )
            return c.pos, vel, c.normal, c.penetration

        pos, vel, normal, penetration = jax.vmap(one)(
            qp_a, qp_b, self.vert_a, self.face_a, self.norm_a, self.edge_a,
            self.vert_b, self.face_b, self.norm_b, self.edge_b,
        )
        return Contact(pos, vel, normal, penetration)


GROUP_TYPES = (
    CapsulePlane,
    CapsuleCapsule,
    BoxPlane,
    MeshPlane,
    CapsuleMesh,
    BoxHeightMap,
    CapsuleClippedPlane,
    HullHull,
)


def _gather_qp(qp: QP, com: GroupCommon) -> Tuple[QP, QP]:
    if com.body_a_dyn is not None:
        return qp.take(com.body_a_dyn), qp.take(com.body_b_dyn)
    return qp.take(com.body_a), qp.take(com.body_b)


def _b1(x: Array) -> Array:
    """Adds the contact axis to a per-pair array: (np, ...) -> (np, 1, ...)."""
    return x[:, None]


def _scatter_average(vals_a, vals_b, com: GroupCommon, nb: int, eps: float):
    """Scatters per-contact updates onto bodies, averaging by contact count.

    Parity: colliders.py:130-153 (and 219-240 for position updates): each
    body's accumulated update is divided by (eps + number of touching
    contacts in this group).
    """
    np_, nc = vals_a[0].shape[0], vals_a[0].shape[1]
    dyn = com.body_a_dyn is not None
    if dyn:
        idx_a = jnp.repeat(com.body_a_dyn, nc)
        parts = [(vals_a, idx_a)]
        if vals_b is not None:
            parts.append((vals_b, jnp.repeat(com.body_b_dyn, nc)))
        scatter = lambda out, idx, vals: out.at[idx].add(vals)
        cat = jnp.concatenate
    else:
        idx_a = onp.repeat(com.body_a.a, nc)
        parts = [(vals_a, idx_a)]
        if vals_b is not None:
            parts.append((vals_b, onp.repeat(com.body_b.a, nc)))
        scatter = lowering.scatter_add_rows
        cat = onp.concatenate

    first_flat = jnp.concatenate(
        [v[0].reshape(-1, v[0].shape[-1]) for v, _ in parts], axis=0
    )
    idx = cat([i for _, i in parts], axis=0)

    count = jnp.where(jnp.any(first_flat != 0, axis=-1), 1.0, 0.0)
    count = scatter(jnp.zeros((nb, 1)), idx, count[:, None])[:, 0]
    denom = (eps + count)[:, None]

    outs = []
    for k in range(len(vals_a)):
        flat = jnp.concatenate(
            [v[k].reshape(-1, v[k].shape[-1]) for v, _ in parts], axis=0
        )
        width = flat.shape[-1]
        acc = scatter(jnp.zeros((nb, width)), idx, flat)
        outs.append(acc / denom)
    return outs


def cull_nearest(group, qp: QP, cutoff: int):
    """Selects the `cutoff` nearest pairs of a contact group for this step.

    Parity: reference NearNeighbors culling (colliders.py:56-89), active when
    a scene sets collider_cutoff below a group's pair count.  Distances are
    body-center distances; the selected rows become traced gathers over the
    group's per-pair tables (static shapes, jit-friendly).
    """
    com = group.com
    n = len(com.body_a.a)
    if cutoff >= n:
        return group
    pos_a = qp.pos[com.body_a.a]
    pos_b = qp.pos[com.body_b.a]
    dist = jnp.linalg.norm(pos_a - pos_b, axis=-1)
    _, idx = jax.lax.top_k(-dist, cutoff)

    def take_rows(x):
        return jnp.asarray(x)[idx]

    new_com = GroupCommon(
        body_a=com.body_a,
        body_b=com.body_b,
        one_way=com.one_way,
        friction=take_rows(com.friction),
        elasticity=take_rows(com.elasticity),
        mass_a=take_rows(com.mass_a),
        inertia_a=take_rows(com.inertia_a),
        mass_b=take_rows(com.mass_b),
        inertia_b=take_rows(com.inertia_b),
        body_a_dyn=jnp.asarray(com.body_a.a)[idx],
        body_b_dyn=jnp.asarray(com.body_b.a)[idx],
    )
    # gather all per-pair geometry tables (leading axis = pair count)
    import dataclasses

    updates = {}
    for f in dataclasses.fields(group):
        if f.name == "com":
            continue
        val = getattr(group, f.name)
        if val is not None and hasattr(val, "shape") and val.shape and val.shape[0] == n:
            updates[f.name] = take_rows(val)
    return group.replace(com=new_com, **updates)


def spring_apply(group, qp: QP, params: SolverParams, nb: int):
    """Velocity-level impulse contact (legacy spring mode, and reset info).

    Parity: OneWayCollider._contact / TwoWayCollider._contact
    (colliders.py:267-304, 449-493).
    """
    com = group.com
    qp_a, qp_b = _gather_qp(qp, com)
    contact = group.contact(qp_a, qp_b)

    elasticity = _b1(com.elasticity)
    friction = _b1(com.friction)
    inertia_a = com.inertia_a[:, None, :]
    mass_a = _b1(com.mass_a)
    pos_a = qp_a.pos[:, None, :]

    rel_pos_a = contact.pos - pos_a
    baumgarte_vel = params.baumgarte_erp * contact.penetration
    normal_vel = vdot(contact.normal, contact.vel)
    temp1 = inertia_a * jnp.cross(rel_pos_a, contact.normal)

    if com.one_way:
        ang = vdot(contact.normal, jnp.cross(temp1, rel_pos_a))
        denom = (1.0 / mass_a) + ang
    else:
        inertia_b = com.inertia_b[:, None, :]
        mass_b = _b1(com.mass_b)
        pos_b = qp_b.pos[:, None, :]
        rel_pos_b = contact.pos - pos_b
        temp2 = inertia_b * jnp.cross(rel_pos_b, contact.normal)
        ang = vdot(contact.normal, jnp.cross(temp1, rel_pos_a) + jnp.cross(temp2, rel_pos_b))
        denom = (1.0 / mass_a) + (1.0 / mass_b) + ang

    impulse = (-1.0 * (1.0 + elasticity) * normal_vel + baumgarte_vel) / denom

    def body_impulse(mass, inertia, qpos, imp_vec, at):
        dvel = imp_vec / mass[..., None]
        dang = inertia * jnp.cross(at - qpos, imp_vec)
        return dvel, dang

    imp_n = impulse[..., None] * contact.normal
    dvel_na, dang_na = body_impulse(mass_a, inertia_a, pos_a, imp_n, contact.pos)

    vel_d = contact.vel - normal_vel[..., None] * contact.normal
    impulse_d = maths.safe_norm(vel_d) / denom
    impulse_d = jnp.minimum(impulse_d, friction * impulse)
    dir_d = vel_d / (1e-6 + maths.safe_norm(vel_d)[..., None])
    dvel_da, dang_da = body_impulse(mass_a, inertia_a, pos_a, -impulse_d[..., None] * dir_d, contact.pos)

    apply_n = jnp.where(
        (contact.penetration > 0.0) & (normal_vel < 0) & (impulse > 0.0), 1.0, 0.0
    )
    apply_d = apply_n * jnp.where(maths.safe_norm(vel_d) > 0.01, 1.0, 0.0)

    an = apply_n[..., None]
    ad = apply_d[..., None]
    dp_a = (dvel_na * an + dvel_da * ad, dang_na * an + dang_da * ad)

    if com.one_way:
        vals_b = None
    else:
        dvel_nb, dang_nb = body_impulse(mass_b, inertia_b, pos_b, -imp_n, contact.pos)
        dvel_db, dang_db = body_impulse(mass_b, inertia_b, pos_b, impulse_d[..., None] * dir_d, contact.pos)
        vals_b = (dvel_nb * an + dvel_db * ad, dang_nb * an + dang_db * ad)

    vel, angv = _scatter_average(dp_a, vals_b, com, nb, eps=1e-8)
    return DP(vel=vel, ang=angv), contact


def position_apply(group, qp: QP, qp_prev: QP, params: SolverParams, nb: int):
    """PBD position-level contact pass.

    Parity: OneWayCollider._position_contact (colliders.py:306-377) and
    TwoWayCollider._position_contact (colliders.py:495-582).
    """
    com = group.com
    qp_a, qp_b = _gather_qp(qp, com)
    qp_a_old, qp_b_old = _gather_qp(qp_prev, com)
    contact = group.contact(qp_a, qp_b)

    friction = _b1(com.friction)
    inertia_a = com.inertia_a[:, None, :]
    mass_a = _b1(com.mass_a)[..., None]
    pos_a = qp_a.pos[:, None, :]
    rot_a = qp_a.rot[:, None, :]
    cs = params.collide_scale

    if com.one_way:
        pos_p = contact.pos
        pos_c = contact.pos + contact.normal * contact.penetration[..., None]
        dx = pos_p - pos_c
        arm_p = pos_p - pos_a
        arm_c = pos_c  # unused for one-way

        n = contact.normal
        c = vdot(dx, n)

        cr1 = jnp.cross(arm_p, n)
        w1 = (1.0 / mass_a[..., 0]) + vdot(cr1, inertia_a * cr1)

        dlambda = -c / (w1 + 1e-6)
        coll_mask = jnp.where(c < 0, 1.0, 0.0)
        p = dlambda[..., None] * n * coll_mask[..., None]

        dq_p_pos = cs * (p / mass_a)
        dq_p_rot = cs * (0.5 * maths.vec_quat_mul(inertia_a * jnp.cross(arm_p, p), rot_a))

        # static friction
        q1inv = maths.quat_inv(rot_a)
        r1 = maths.rotate(contact.pos - pos_a, q1inv)
        p1bar = qp_a_old.pos[:, None, :] + maths.rotate(r1, qp_a_old.rot[:, None, :])
        deltap = contact.pos - p1bar
        deltap_t = deltap - dot1(deltap, n) * n

        ct = maths.safe_norm(deltap_t)
        nt = deltap_t / (ct[..., None] + 1e-6)
        cr1t = jnp.cross(arm_p, nt)
        w1t = (1.0 / mass_a[..., 0]) + vdot(cr1t, inertia_a * cr1t)
        dlambdat = -ct / (w1t + 0.0)
        static_mask = jnp.where(jnp.abs(dlambdat) < jnp.abs(friction * dlambda), 1.0, 0.0)
        pt = dlambdat[..., None] * nt * static_mask[..., None] * coll_mask[..., None]

        dq_p_pos = dq_p_pos + cs * (pt / mass_a)
        dq_p_rot = dq_p_rot + cs * (0.5 * maths.vec_quat_mul(inertia_a * jnp.cross(arm_p, pt), rot_a))

        vals_a = (dq_p_pos, dq_p_rot)
        vals_b = None
        dlambda_out = dlambda * coll_mask
    else:
        inertia_b = com.inertia_b[:, None, :]
        mass_b = _b1(com.mass_b)[..., None]
        pos_b = qp_b.pos[:, None, :]
        rot_b = qp_b.rot[:, None, :]

        pen = contact.penetration[..., None]
        pos_p = contact.pos - contact.normal * pen / 2.0
        pos_c = contact.pos + contact.normal * pen / 2.0
        arm_p = pos_p - pos_a
        arm_c = pos_c - pos_b

        n = contact.normal
        c = -contact.penetration

        cr1 = jnp.cross(arm_p, n)
        w1 = (1.0 / mass_a[..., 0]) + vdot(cr1, inertia_a * cr1)
        cr2 = jnp.cross(arm_c, n)
        w2 = (1.0 / mass_b[..., 0]) + vdot(cr2, inertia_b * cr2)

        dlambda = -c / (w1 + w2 + 1e-6)
        coll_mask = jnp.where(c < 0, 1.0, 0.0)
        p = dlambda[..., None] * n * coll_mask[..., None]

        dq_p_pos = cs * (p / mass_a)
        dq_p_rot = cs * (0.5 * maths.vec_quat_mul(inertia_a * jnp.cross(arm_p, p), rot_a))
        dq_c_pos = cs * (-p / mass_b)
        dq_c_rot = cs * (-0.5 * maths.vec_quat_mul(inertia_b * jnp.cross(arm_c, p), rot_b))

        # static friction
        r1 = maths.rotate(contact.pos - pos_a, maths.quat_inv(rot_a))
        r2 = maths.rotate(contact.pos - pos_b, maths.quat_inv(rot_b))
        p1bar = qp_a_old.pos[:, None, :] + maths.rotate(r1, qp_a_old.rot[:, None, :])
        p2bar = qp_b_old.pos[:, None, :] + maths.rotate(r2, qp_b_old.rot[:, None, :])
        deltap = (contact.pos - p1bar) - (contact.pos - p2bar)
        deltap_t = deltap - dot1(deltap, n) * n

        arm_p2 = contact.pos - pos_a
        arm_c2 = contact.pos - pos_b

        ct = maths.safe_norm(deltap_t)
        nt = deltap_t / (ct[..., None] + 1e-6)
        cr1t = jnp.cross(arm_p2, nt)
        w1t = (1.0 / mass_a[..., 0]) + vdot(cr1t, inertia_a * cr1t)
        cr2t = jnp.cross(arm_c2, nt)
        w2t = (1.0 / mass_b[..., 0]) + vdot(cr2t, inertia_b * cr2t)
        dlambdat = -ct / (w1t + w2t)
        static_mask = jnp.where(jnp.abs(dlambdat) < jnp.abs(dlambda), 1.0, 0.0)
        pt = dlambdat[..., None] * nt * static_mask[..., None] * coll_mask[..., None]

        dq_p_pos = dq_p_pos + cs * (pt / mass_a)
        dq_p_rot = dq_p_rot + cs * (0.5 * maths.vec_quat_mul(inertia_a * jnp.cross(arm_p2, pt), rot_a))
        dq_c_pos = dq_c_pos + cs * (-pt / mass_b)
        dq_c_rot = dq_c_rot + cs * (0.5 * maths.vec_quat_mul(inertia_b * jnp.cross(arm_c2, -pt), rot_b))

        vals_a = (dq_p_pos, dq_p_rot)
        vals_b = (dq_c_pos, dq_c_rot)
        dlambda_out = dlambda

    pos_out, rot_out = _scatter_average(vals_a, vals_b, com, nb, eps=1e-6)
    return DQ(pos=pos_out, rot=rot_out), dlambda_out, contact


def velocity_apply(group, qp: QP, dlambda: Array, qp_prev: QP, contact: Contact,
                   params: SolverParams, nb: int) -> DP:
    """PBD velocity-level contact pass (dynamic friction + restitution).

    Parity: OneWayCollider._velocity_contact (colliders.py:379-442) and
    TwoWayCollider._velocity_contact (colliders.py:584-658).
    """
    com = group.com
    qp_a, qp_b = _gather_qp(qp, com)
    qp_a_old, qp_b_old = _gather_qp(qp_prev, com)

    friction = _b1(com.friction)
    elasticity = _b1(com.elasticity)
    inertia_a = com.inertia_a[:, None, :]
    mass_a = _b1(com.mass_a)
    pos_a = qp_a.pos[:, None, :]

    n = contact.normal
    if com.one_way:
        rel_vel = qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], contact.pos - pos_a)
    else:
        pos_b = qp_b.pos[:, None, :]
        rel_vel = (
            qp_a.vel[:, None, :] + jnp.cross(qp_a.ang[:, None, :], contact.pos - pos_a)
        ) - (qp_b.vel[:, None, :] + jnp.cross(qp_b.ang[:, None, :], contact.pos - pos_b))

    v_n = vdot(rel_vel, n)
    v_t = rel_vel - n * v_n[..., None]
    v_t_norm = maths.safe_norm(v_t)
    v_t_dir = v_t / (1e-6 + v_t_norm[..., None])

    # factor of 2: one collision pass per two physics substeps
    dvel_mag = -jnp.minimum(friction * jnp.abs(dlambda) / (2.0 * params.h), v_t_norm)
    dvel = v_t_dir * dvel_mag[..., None]

    if com.one_way:
        angw = jnp.cross(contact.pos - pos_a, v_t_dir)
        w = (1.0 / mass_a) + vdot(angw, angw)  # note: no inertia term (ref parity)
        p_dyn = dvel / (w[..., None] + 1e-6)
    else:
        inertia_b = com.inertia_b[:, None, :]
        mass_b = _b1(com.mass_b)
        angw_1 = jnp.cross(contact.pos - pos_a, v_t_dir)
        angw_2 = jnp.cross(contact.pos - pos_b, v_t_dir)
        w1 = (1.0 / mass_a) + vdot(angw_1, inertia_a * angw_1)
        w2 = (1.0 / mass_b) + vdot(angw_2, inertia_b * angw_2)
        p_dyn = dvel / ((w1 + w2)[..., None] + 1e-6)

    # restitution
    if com.one_way:
        rel_vel_old = qp_a_old.vel[:, None, :] + jnp.cross(
            qp_a_old.ang[:, None, :], contact.pos - qp_a_old.pos[:, None, :]
        )
    else:
        rel_vel_old = (
            qp_a_old.vel[:, None, :]
            + jnp.cross(qp_a_old.ang[:, None, :], contact.pos - qp_a_old.pos[:, None, :])
        ) - (
            qp_b_old.vel[:, None, :]
            + jnp.cross(qp_b_old.ang[:, None, :], contact.pos - qp_b_old.pos[:, None, :])
        )
    v_n_old = vdot(rel_vel_old, n)

    dv_rest = n * (-v_n - jnp.minimum(elasticity * v_n_old, 0.0))[..., None]

    arm_p = contact.pos - pos_a
    c = maths.safe_norm(dv_rest)
    nr = dv_rest / (c[..., None] + 1e-6)

    cr1 = jnp.cross(arm_p, nr)
    w1r = (1.0 / mass_a) + vdot(cr1, inertia_a * cr1)
    if com.one_way:
        dlambda_rest = c / (w1r + 1e-6)
        sinking = jnp.where(v_n_old <= -params.velocity_threshold, 1.0, 0.0)
    else:
        arm_c = contact.pos + contact.normal * contact.penetration[..., None] - pos_b
        cr2 = jnp.cross(arm_c, nr)
        w2r = (1.0 / mass_b) + vdot(cr2, inertia_b * cr2)
        dlambda_rest = c / (w1r + w2r + 1e-6)
        sinking = jnp.where(v_n_old <= 0.0, 1.0, 0.0)

    static_mask = jnp.where(contact.penetration > 0, 1.0, 0.0)
    p = (dlambda_rest[..., None] * nr * sinking[..., None] + p_dyn) * static_mask[..., None]

    dp_a = (
        p / mass_a[..., None],
        jnp.cross(inertia_a * (contact.pos - pos_a), p),
    )
    if com.one_way:
        vals_b = None
    else:
        vals_b = (
            -p / mass_b[..., None],
            jnp.cross(inertia_b * (contact.pos - pos_b), -p),
        )

    vel, angv = _scatter_average(dp_a, vals_b, com, nb, eps=1e-6)
    return DP(vel=vel, ang=angv)
