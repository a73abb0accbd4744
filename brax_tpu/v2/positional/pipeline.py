"""Position-based (XPBD-style) physics pipeline on v2 types.

A real implementation of the backend the reference leaves as a stub
(reference brax/v2/positional/pipeline.py:39-43).  One step:

1. integrate velocities (gravity, damping, actuator forces) and positions
2. project joint anchors together at position level (inverse-mass weighted,
   Gauss-Seidel over the kinematic tree)
3. resolve contact penetration at position level
4. recover velocities from the position delta, then apply restitution and
   dynamic friction impulses
5. inverse kinematics to refresh (q, qd)

The scheme is the same PBD family as the v1 engine (brax/physics, rebuilt in
brax_tpu.sim) but operates on the v2 System/Link/DoF description, so any
MJCF-loaded scene can run positional dynamics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu import maths
from brax_tpu.v2 import actuator, base, geometry, kinematics
from brax_tpu.v2.base import Motion, System, Transform
from brax_tpu.v2.spring import maximal

Array = jax.Array


@struct.dataclass
class State(base.State):
    """Positional pipeline state (q, qd, x, xd, contact)."""


@maths.physics_precision
def init(sys: System, q: Array, qd: Array) -> State:
    x, xd = kinematics.forward(sys, q, qd)
    contact = geometry.contact(sys, x)
    return State(q, qd, x, xd, contact)


def _integrate_velocities(sys, xi, xdi, inv_inertia, f, pos, link_idx):
    """Applies world-frame forces and gravity at acceleration level."""
    xi_all = xi.take(link_idx)
    mass = sys.link.inertia.mass.take(link_idx)
    inv_i = inv_inertia.take(link_idx, axis=0)
    xddi_all = maximal.world_impulse(xi_all.pos, mass, inv_i, f.vel, pos, torque=f.ang)
    dxddi = jax.tree_util.tree_map(
        lambda v: jax.ops.segment_sum(v, link_idx, xi.pos.shape[0]), xddi_all
    )
    vel = jnp.exp(sys.vel_damping * sys.dt) * xdi.vel + (dxddi.vel + sys.gravity) * sys.dt
    ang = jnp.exp(sys.ang_damping * sys.dt) * xdi.ang + dxddi.ang * sys.dt
    return Motion(vel=vel, ang=ang)


def _kinetic(sys, xi, xdi):
    pos = xi.pos + xdi.vel * sys.dt
    drot = maths.quat_mul(maths.ang_to_quat(xdi.ang) * 0.5 * sys.dt, xi.rot)
    rot = xi.rot + drot
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return Transform(pos=pos, rot=rot)


def _joint_projection(sys, xi, inv_inertia, x_link):
    """One PBD pass enforcing joint constraints at position level.

    Translation: each child's joint anchor is pulled onto its parent's
    (inverse-mass weighted).  Rotation (1-dof links): the joint axis is kept
    aligned between parent and child frames and the joint angle clamped to
    its limits, like the v1 PBD revolute rows.  Free links are skipped.
    """
    mass = sys.link.inertia.mass
    free_mask = jnp.array([1.0 if t != "f" else 0.0 for t in sys.link_types])

    p_idx = jnp.array(sys.link_parents)
    has_parent = (p_idx != -1).astype(jnp.float32)

    # anchors in world frame, computed from the CoM-frame state
    # reconstruct link frames from CoM frames: x_link = xi shifted by -ipos
    ipos_world = maths.rotate(sys.link.inertia.transform.pos, xi.rot)
    link_pos = xi.pos - ipos_world
    x_l = Transform(pos=link_pos, rot=xi.rot)

    x_pad = x_l.concatenate(Transform.zero((1,)))
    x_p = x_pad.take(p_idx)
    anchor_p = x_p.do(sys.link.transform).do(sys.link.joint)
    anchor_c = x_l.do(sys.link.joint)

    dx = anchor_p.pos - anchor_c.pos  # pull child toward parent anchor
    # prismatic links keep their slide axis free: remove that component
    slide = _slide_axes(sys)
    if slide is not None:
        slide_idx, slide_axis, slide_lims, prismatic = slide
        axis_w = maths.rotate(
            slide_axis,
            maths.quat_mul(
                jnp.concatenate([xi.rot, jnp.array([[1.0, 0, 0, 0]])])[
                    p_idx[slide_idx]
                ],
                sys.link.transform.rot[slide_idx],
            ),
        )
        d_sel = dx[slide_idx]
        along = jnp.sum(d_sel * axis_w, axis=-1)
        # clamp the slide coordinate to its limits; free inside the range
        target = jnp.clip(-along, slide_lims[:, 0], slide_lims[:, 1])
        d_fixed = d_sel + (target * prismatic)[:, None] * axis_w
        dx = dx.at[slide_idx].set(
            jnp.where(prismatic[:, None] > 0, d_fixed, d_sel)
        )
    n, c = maths.normalize_with_norm(dx)

    arm_c = anchor_c.pos - xi.pos
    xi_p = xi.concatenate(Transform.zero((1,))).take(p_idx)
    arm_p = anchor_p.pos - xi_p.pos

    inv_mass_c = 1.0 / mass
    inv_mass_p = jnp.concatenate([1.0 / mass, jnp.zeros(1)]).take(p_idx)
    inv_i_c = inv_inertia
    inv_i_p = jnp.concatenate([inv_inertia, jnp.zeros((1, 3, 3))]).take(p_idx, axis=0)

    cr_c = jnp.cross(arm_c, n)
    w_c = inv_mass_c + jnp.einsum("ni,nij,nj->n", cr_c, inv_i_c, cr_c)
    cr_p = jnp.cross(arm_p, n)
    w_p = (
        inv_mass_p + jnp.einsum("ni,nij,nj->n", cr_p, inv_i_p, cr_p)
    ) * has_parent

    dlambda = c / (w_c + w_p + 1e-8)
    p_imp = n * (dlambda * free_mask)[:, None]

    # child moves toward parent; parent reacts
    dpos_c = p_imp * inv_mass_c[:, None]
    dang_c = 0.5 * maths.vec_quat_mul(
        jnp.einsum("nij,nj->ni", inv_i_c, jnp.cross(arm_c, p_imp)), xi.rot
    )

    # scatter parent reaction
    neg = -p_imp * (inv_mass_p * has_parent)[:, None]
    dpos_p = jax.ops.segment_sum(
        jnp.where(has_parent[:, None] > 0, neg, 0.0),
        jnp.maximum(p_idx, 0),
        sys.num_links(),
    )
    torque_p = jnp.einsum("nij,nj->ni", inv_i_p, jnp.cross(arm_p, -p_imp))
    torque_p = torque_p * (has_parent * free_mask)[:, None]
    torque_p_sum = jax.ops.segment_sum(
        torque_p, jnp.maximum(p_idx, 0), sys.num_links()
    )
    dang_p = 0.5 * maths.vec_quat_mul(torque_p_sum, xi.rot)

    pos = xi.pos + dpos_c + dpos_p
    rot = xi.rot + dang_c * free_mask[:, None] + dang_p
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    xi = Transform(pos=pos, rot=rot)

    # angular rows for 1-dof revolute links: axis alignment + joint limit
    rev_rows = _revolute_rows(sys)
    if rev_rows is not None:
        xi = _revolute_angular_projection(sys, xi, inv_inertia, rev_rows)
    return xi


def _one_dof_links(sys):
    """Static index plan for 1-dof links: (link idx, qd idx) or None.

    Only link_types (static) drives control flow; axis values, prismatic
    detection and limits stay traced so System leaves can be vmapped (domain
    randomization) or jitted as arguments.
    """
    from brax_tpu.v2.base import QD_WIDTHS

    idxs, qds = [], []
    qd_off = 0
    for i, t in enumerate(sys.link_types):
        if t == "1":
            idxs.append(i)
            qds.append(qd_off)
        qd_off += QD_WIDTHS[t]
    if not idxs:
        return None
    return jnp.array(idxs), jnp.array(qds)


def _slide_axes(sys):
    """Prismatic metadata: (link idx, slide axis, limits, prismatic mask)."""
    plan = _one_dof_links(sys)
    if plan is None:
        return None
    idxs, qds = plan
    ang = sys.dof.motion.ang[qds]
    vel = sys.dof.motion.vel[qds]
    prismatic = (jnp.sum(jnp.abs(ang), axis=-1) == 0.0).astype(jnp.float32)
    if sys.dof.limit is not None:
        lims = jnp.stack([sys.dof.limit[0][qds], sys.dof.limit[1][qds]], axis=-1)
    else:
        lims = jnp.stack(
            [jnp.full(idxs.shape, -jnp.inf), jnp.full(idxs.shape, jnp.inf)], axis=-1
        )
    return idxs, vel, lims, prismatic


def _revolute_rows(sys):
    """1-dof angular projection metadata: axis, ref vector, limits.

    Rotational links keep their dof limits; prismatic links lock rotation
    entirely (angle clamped to [0, 0]).  All values are traced.
    """
    plan = _one_dof_links(sys)
    if plan is None:
        return None
    idxs, qds = plan
    ang = sys.dof.motion.ang[qds]
    vel = sys.dof.motion.vel[qds]
    rotational = (jnp.sum(jnp.abs(ang), axis=-1) > 0.0)[:, None]
    axes = jnp.where(rotational, ang, vel)
    ref, _ = maths.orthogonals(axes)
    ref = ref / (1e-8 + maths.safe_norm(ref)[:, None])
    if sys.dof.limit is not None:
        lo, hi = sys.dof.limit[0][qds], sys.dof.limit[1][qds]
    else:
        lo = jnp.full(idxs.shape, -jnp.inf)
        hi = jnp.full(idxs.shape, jnp.inf)
    rot1 = rotational[:, 0]
    lims = jnp.stack(
        [jnp.where(rot1, lo, 0.0), jnp.where(rot1, hi, 0.0)], axis=-1
    )
    return idxs, axes, ref, lims


def _revolute_angular_projection(sys, xi, inv_inertia, rows):
    """Aligns each revolute child's joint axis with its parent's and clamps
    the joint angle to its limits (two PBD angular rows per joint)."""
    idxs, axes, refs, lims = rows
    p_idx = jnp.array(sys.link_parents)[idxs]

    rot_c = xi.rot[idxs]
    rot_all_p = jnp.concatenate([xi.rot, jnp.array([[1.0, 0, 0, 0]])])
    rot_p = rot_all_p[p_idx]
    # joint frames include the static link transform rotation on the parent
    rot_p = maths.quat_mul(rot_p, sys.link.transform.rot[idxs])

    inv_i_c = inv_inertia[idxs]
    inv_i_all_p = jnp.concatenate([inv_inertia, jnp.zeros((1, 3, 3))])
    inv_i_p = inv_i_all_p[p_idx] * (p_idx != -1).astype(jnp.float32)[:, None, None]

    a_p = maths.rotate(axes, rot_p)
    a_c = maths.rotate(axes, rot_c)
    ref_p = maths.rotate(refs, rot_p)
    ref_c = maths.rotate(refs, rot_c)

    # row 1: align axes; row 2: clamp angle to limits
    dq1 = jnp.cross(a_p, a_c)
    psi = maths.signed_angle(a_p, ref_p, ref_c)
    ph = jnp.clip(psi, lims[:, 0], lims[:, 1])
    fixrot = maths.quat_rot_axis(a_p, ph)
    n1 = maths.rotate(ref_p, fixrot)
    dq2 = jnp.cross(n1, ref_c)

    rot_updates = jnp.zeros_like(xi.rot)
    rot_updates_p = jnp.zeros_like(xi.rot)
    for dq in (dq1, dq2):
        th = maths.safe_norm(dq)
        nn = dq / (th + 1e-6)[:, None]
        w_c = jnp.einsum("ni,nij,nj->n", nn, inv_i_c, nn)
        w_p = jnp.einsum("ni,nij,nj->n", nn, inv_i_p, nn)
        dl = -th / (w_c + w_p + 1e-8)
        pa = nn * (-dl)[:, None]
        # dq rows point from child toward parent alignment: parent rotates
        # along +pa, child along -pa (v1 PBD revolute sign convention)
        qc = -0.5 * maths.vec_quat_mul(
            jnp.einsum("nij,nj->ni", inv_i_c, pa), rot_c
        )
        qp = 0.5 * maths.vec_quat_mul(
            jnp.einsum("nij,nj->ni", inv_i_p, pa), xi.rot[jnp.maximum(p_idx, 0)]
        )
        rot_updates = rot_updates.at[idxs].add(qc)
        rot_updates_p = rot_updates_p.at[jnp.maximum(p_idx, 0)].add(
            qp * (p_idx != -1).astype(jnp.float32)[:, None]
        )

    rot = xi.rot + rot_updates + rot_updates_p
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return Transform(pos=xi.pos, rot=rot)


def _scatter_impulses(sys, inv_inertia, p, arm, link_idx):
    """Applies +p rows to link a and -p to link b; averages over contacts."""
    mass = sys.link.inertia.mass
    n_links = sys.num_links()
    idx = jnp.concatenate([link_idx[:, 0], link_idx[:, 1]])
    imp = jnp.concatenate([p, -p])
    arms = jnp.concatenate([arm[:, 0], arm[:, 1]])
    ok = idx > -1
    active = ok & jnp.any(imp != 0.0, axis=-1)
    safe = jnp.maximum(idx, 0)
    m = mass.take(safe)
    dpos = jax.ops.segment_sum(
        jnp.where(ok[:, None], imp / m[:, None], 0.0), safe, n_links
    )
    torque = jnp.einsum(
        "nij,nj->ni", inv_inertia.take(safe, axis=0), jnp.cross(arms, imp)
    )
    dang = jax.ops.segment_sum(jnp.where(ok[:, None], torque, 0.0), safe, n_links)
    cnt = jax.ops.segment_sum(active.astype(jnp.float32), safe, n_links)
    denom = jnp.maximum(cnt, 1.0)[:, None]
    return dpos / denom, dang / denom


def _contact_position_pass(sys, xi, inv_inertia, contact):
    """Position-level penetration correction; returns xi and per-contact
    normal magnitudes (for the friction cap in the velocity pass)."""
    mass = sys.link.inertia.mass

    @jax.vmap
    def one(contact):
        link_idx = jnp.array(contact.link_idx)
        valid = (contact.penetration > 0).astype(jnp.float32)
        xi_ab = xi.take(link_idx)
        m_ab = mass.take(link_idx)
        inv_i_ab = inv_inertia.take(link_idx, axis=0)
        present = (link_idx > -1).astype(jnp.float32)

        arm = contact.pos - xi_ab.pos
        n = contact.normal
        cr = jnp.cross(arm, jnp.broadcast_to(n, arm.shape))
        w = (1.0 / m_ab) * present + jnp.einsum(
            "ni,nij,nj->n", cr, inv_i_ab, cr
        ) * present
        dlambda = contact.penetration / (w[0] + w[1] + 1e-8)
        p_imp = n * dlambda * valid
        return p_imp, arm, link_idx, dlambda * valid

    p_imp, arm, link_idx, dlambda = one(contact)
    dpos, dang = _scatter_impulses(sys, inv_inertia, p_imp, arm, link_idx)
    pos = xi.pos + dpos
    rot = xi.rot + 0.5 * maths.vec_quat_mul(dang, xi.rot)
    rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
    return Transform(pos=pos, rot=rot), (arm, link_idx, dlambda)


def _contact_velocity_pass(sys, xi, xdi, xdi_old, inv_inertia, contact, aux):
    """Dynamic friction + restitution on post-projection velocities.

    xdi_old (pre-contact velocities) supplies the approach speed for the
    restitution target, mirroring the v1 PBD velocity pass.
    """
    arm, link_idx, dlambda = aux
    mass = sys.link.inertia.mass

    @jax.vmap
    def one(contact, arm, link_idx, dlambda):
        valid = (contact.penetration > 0).astype(jnp.float32)
        present = (link_idx > -1).astype(jnp.float32)
        m_ab = mass.take(link_idx)
        inv_i_ab = inv_inertia.take(link_idx, axis=0)
        n = contact.normal

        def contact_vel(xd):
            xd_ab = xd.take(link_idx)
            rel = (xd_ab.vel + jnp.cross(xd_ab.ang, arm)) * present[:, None]
            return rel[0] - rel[1]

        cvel = contact_vel(xdi)
        vn = jnp.dot(cvel, n)
        vt = cvel - vn * n
        vt_norm = maths.safe_norm(vt)
        vt_dir = vt / (1e-6 + vt_norm)

        # dynamic friction capped by the Coulomb cone of the position impulse
        max_f = contact.friction * jnp.abs(dlambda) / sys.dt
        dv_t = -jnp.minimum(max_f, vt_norm)

        # restitution from the pre-contact approach velocity; only sinking
        # contacts get the normal correction (cancels the upward velocity
        # artifact that position projection would otherwise inject)
        vn_old = jnp.dot(contact_vel(xdi_old), n)
        sinking = (vn_old <= 0.0).astype(jnp.float32)
        dv_n = (-vn - jnp.minimum(contact.elasticity * vn_old, 0.0)) * sinking

        dvel = (vt_dir * dv_t + n * dv_n) * valid
        cr = jnp.cross(arm, jnp.broadcast_to(n, arm.shape))
        w = (1.0 / m_ab) * present + jnp.einsum(
            "ni,nij,nj->n", cr, inv_i_ab, cr
        ) * present
        p_vel = dvel / (w[0] + w[1] + 1e-8)
        return p_vel

    p_vel = one(contact, arm, link_idx, dlambda)
    dvel, dang_v = _scatter_impulses(sys, inv_inertia, p_vel, arm, link_idx)
    return Motion(vel=xdi.vel + dvel, ang=xdi.ang + dang_v)


def _velocity_projection(sys, xi, xi_prev):
    """Velocities from position deltas (the PBD velocity update)."""
    vel = (xi.pos - xi_prev.pos) / sys.dt
    dq = maths.quat_mul(xi.rot, maths.quat_inv(xi_prev.rot))
    sgn = jnp.where(dq[..., 0:1] >= 0.0, 1.0, -1.0)
    ang = sgn * 2.0 * dq[..., 1:] / sys.dt
    return Motion(vel=vel, ang=ang)


@maths.physics_precision
def step(sys: System, state: State, act: Array) -> State:
    """One positional-dynamics step."""
    x, xd = state.x, state.xd

    tau_local = actuator.to_tau(sys, act, state.q)
    f_a, pos_a, link_idx_a = actuator.to_tau_world(sys, state.q, tau_local)

    xi, xdi = maximal.maximal_to_com(sys, x, xd)
    coord_transform = Transform(pos=xi.pos - x.pos, rot=x.rot)
    inv_inertia = maximal.com_inv_inertia(sys, x)

    xdi = _integrate_velocities(sys, xi, xdi, inv_inertia, f_a, pos_a, link_idx_a)
    xdi_old = xdi
    xi_prev = xi
    xi = _kinetic(sys, xi, xdi)

    # position-level joint projection (a few Gauss-Seidel passes)
    for _ in range(2):
        xi = _joint_projection(sys, xi, inv_inertia, x)

    # contacts in the post-projection frame, at position level first
    link_frame = Transform(
        pos=xi.pos - maths.rotate(sys.link.inertia.transform.pos, xi.rot),
        rot=xi.rot,
    )
    contact = geometry.contact(sys, link_frame)
    if contact is not None:
        xi, aux = _contact_position_pass(sys, xi, inv_inertia, contact)

    # velocities from the total position delta, then friction/restitution
    xdi = _velocity_projection(sys, xi, xi_prev)
    if contact is not None:
        xdi = _contact_velocity_pass(
            sys, xi, xdi, xdi_old, inv_inertia, contact, aux
        )

    x, xd = maximal.com_to_maximal(xi, xdi, coord_transform)
    q, qd = kinematics.inverse(sys, x, xd)
    return State(q, qd, x, xd, contact)
