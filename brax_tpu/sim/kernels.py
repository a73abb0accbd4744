"""Fused Pallas TPU kernel for the PBD physics step.

Why: the XLA path lowers one env step of ant to ~2,200 tiny kernels (tens of
bodies x 8 substeps of joint/contact math), each processing a (batch, 10, 3)
array for under a microsecond — the program is launch-latency-bound, not
compute-bound.  This module compiles the ENTIRE step (all substeps: actuators,
joint damping, PBD joint projection, capsule-plane contacts with friction and
restitution, integration) into ONE Pallas kernel per environment tile.

Design (see /opt/skills/guides/pallas_guide.md):
- the env batch axis is the minor (lane) dimension: every state row is a
  (TILE,) full-width VPU vector; bodies/joints/contacts unroll as static
  Python loops at trace time;
- all physics parameters (masses, inertias, joint frames, limits) bake into
  the kernel as scalar literals — zero captured constants, zero gathers;
- grid = num_envs // TILE programs, each owning its env tile in VMEM.

The jnp path (brax_tpu.sim.system) remains the source of truth: it serves
autodiff (APG), CPU, and scene features this kernel does not cover yet.
`supported(sys)` reports coverage; `build_step_fn` falls back to the vmapped
jnp step when unsupported.  Numerics match the jnp path to float32
round-off (atan2 uses a minimax polynomial; see tests/test_pallas_kernel.py).

Covers: PBD mode, revolute joints, 1-dof torque actuators, one-way
capsule-plane contacts, thruster forces absent.  (This spans ant, the
reference's headline benchmark env.)
"""

from __future__ import annotations

import functools
import math as pymath
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.sim import colliders as colliders_mod
from brax_tpu.sim.system import System
from brax_tpu.sim.types import QP, Info

# ---------------------------------------------------------------------------
# small vector/quaternion algebra on (C, T) row stacks
# each logical 3-vector / quaternion is a tuple of (T,)-shaped lane vectors
# ---------------------------------------------------------------------------


def _v3(x, y, z):
    return (x, y, z)


def _vadd(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _vsub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _vscale(a, s):
    return tuple(x * s for x in a)


def _vmul(a, b):  # elementwise
    return tuple(x * y for x, y in zip(a, b))


def _vdot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _vcross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _vnorm_safe(a):
    """maths.safe_norm semantics: 0 where all |components| <= 1e-8."""
    is_zero = (jnp.abs(a[0]) <= 1e-8) & (jnp.abs(a[1]) <= 1e-8) & (jnp.abs(a[2]) <= 1e-8)
    sq = a[0] * a[0] + a[1] * a[1] + a[2] * a[2]
    n = jnp.sqrt(jnp.where(is_zero, 1.0, sq))
    return jnp.where(is_zero, 0.0, n)


def _qmul(u, v):
    """quaternion product, (w, x, y, z) tuples."""
    return (
        u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
        u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
        u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
        u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
    )


def _qinv(q):
    return (q[0], -q[1], -q[2], -q[3])


def _rotate(v, q):
    """maths.rotate: 2*dot(u,v)*u + (s^2 - dot(u,u))*v + 2s*(u x v)."""
    s, u = q[0], (q[1], q[2], q[3])
    du_v = _vdot(u, v)
    du_u = _vdot(u, u)
    cx = _vcross(u, v)
    coef = s * s - du_u
    return (
        2 * du_v * u[0] + coef * v[0] + 2 * s * cx[0],
        2 * du_v * u[1] + coef * v[1] + 2 * s * cx[1],
        2 * du_v * u[2] + coef * v[2] + 2 * s * cx[2],
    )


def _vec_qmul(v, q):
    """maths.vec_quat_mul: quat_mul((0, v), q) -> full quaternion."""
    return _qmul((jnp.zeros_like(v[0]), v[0], v[1], v[2]), q)


def _arctan(t):
    """minimax atan (same coefficients as maths._arctan_poly)."""
    big = jnp.abs(t) > 1.0
    tt = jnp.where(big, 1.0 / jnp.where(t == 0, 1.0, t), t)
    z = tt * tt
    p = jnp.full_like(t, -0.0040540580)
    for c in (0.0218612288, -0.0559098861, 0.0964200441, -0.1390853351,
              0.1994653599, -0.3332985605, 0.9999993329):
        p = p * z + c
    r = tt * p
    half_pi = pymath.pi / 2
    return jnp.where(big, jnp.sign(t) * half_pi - r, r)


def _arctan2(y, x):
    safe_x = jnp.where(x == 0, 1.0, x)
    base = _arctan(y / safe_x)
    pi = pymath.pi
    out = base
    out = jnp.where((x < 0) & (y >= 0), base + pi, out)
    out = jnp.where((x < 0) & (y < 0), base - pi, out)
    out = jnp.where((x == 0) & (y > 0), pi / 2, out)
    out = jnp.where((x == 0) & (y < 0), -pi / 2, out)
    out = jnp.where((x == 0) & (y == 0), 0.0, out)
    return out


def _signed_angle(axis, ref_p, ref_c):
    return _arctan2(_vdot(_vcross(ref_p, ref_c), axis), _vdot(ref_p, ref_c))


# ---------------------------------------------------------------------------
# support probing
# ---------------------------------------------------------------------------


def supported(sys: System) -> bool:
    """True if the fused kernel covers this system's features."""
    if sys.dynamics_mode != "pbd":
        return False
    if sys.force_groups:
        return False
    for g in sys.joint_groups:
        if g.kind != "revolute":
            return False
    for a in sys.actuator_groups:
        if a.kind != "torque":
            return False
    for c in sys.contact_groups:
        if not isinstance(c, colliders_mod.CapsulePlane) or not c.com.one_way:
            return False
    return True


# ---------------------------------------------------------------------------
# the fused step, built per System (all params baked as literals)
# ---------------------------------------------------------------------------


def _build_tile_step(sys: System):
    """Returns f(pos, rot, vel, ang, act) in (rows..., T) layout.

    pos/vel/ang: (nb, 3, T); rot: (nb, 4, T); act: (na, T).
    Returns new (pos, rot, vel, ang, contact_vel, contact_ang) — the last two
    are the accumulated per-body contact impulses (Info.contact parity).
    """
    nb = sys.num_bodies
    integ = sys.integrator
    f = float

    dt = f(integ.dt)
    gravity = tuple(f(g) for g in onp.asarray(integ.gravity))
    vel_decay = pymath.exp(f(integ.velocity_damping) * dt)
    ang_decay = pymath.exp(f(integ.angular_damping) * dt)
    pos_mask = onp.asarray(integ.pos_mask, onp.float64)
    rot_mask = onp.asarray(integ.rot_mask, onp.float64)
    quat_mask = onp.asarray(integ.quat_mask, onp.float64)
    mass = onp.asarray(sys.mass, onp.float64)
    inv_inertia = onp.asarray(sys.inv_inertia, onp.float64)
    cs = f(sys.solver.collide_scale)
    h = f(sys.solver.h)
    vel_threshold = f(sys.solver.velocity_threshold)

    # joint tables (all revolute; checked by supported())
    joints = []
    for g in sys.joint_groups:
        off_p = onp.asarray(g.off_p, onp.float64)
        off_c = onp.asarray(g.off_c, onp.float64)
        axis_p = onp.asarray(g.axis_p, onp.float64)  # (nj, 3, 3)
        axis_c = onp.asarray(g.axis_c, onp.float64)
        limit = onp.asarray(g.limit, onp.float64)  # (nj, 1, 2)
        ad = onp.asarray(g.angular_damping, onp.float64)
        sp = onp.asarray(g.scale_pos, onp.float64)
        sa = onp.asarray(g.scale_ang, onp.float64)
        for j in range(g.n):
            joints.append(
                dict(
                    p=int(g.parent.a[j]),
                    c=int(g.child.a[j]),
                    off_p=tuple(map(f, off_p[j])),
                    off_c=tuple(map(f, off_c[j])),
                    axis_p=[tuple(map(f, axis_p[j][k])) for k in range(3)],
                    axis_c=[tuple(map(f, axis_c[j][k])) for k in range(3)],
                    lo=f(limit[j, 0, 0]),
                    hi=f(limit[j, 0, 1]),
                    angular_damping=f(ad[j]),
                    scale_pos=f(sp[j]),
                    scale_ang=f(sa[j]),
                    mass_p=f(mass[int(g.parent.a[j])]),
                    mass_c=f(mass[int(g.child.a[j])]),
                    inertia_p=tuple(map(f, inv_inertia[int(g.parent.a[j])])),
                    inertia_c=tuple(map(f, inv_inertia[int(g.child.a[j])])),
                )
            )

    # actuator tables: (joint index within `joints`, act index, strength)
    actuators = []
    joint_base = {}
    base = 0
    for gi, g in enumerate(sys.joint_groups):
        joint_base[gi] = base
        base += g.n
    for a in sys.actuator_groups:
        strength = onp.asarray(a.strength, onp.float64)
        for k in range(a.n):
            actuators.append(
                dict(
                    j=joint_base[a.group_index] + int(a.joint_sel.a[k]),
                    act=int(a.act_index.a[k, 0]),
                    strength=f(strength[k]),
                )
            )

    # contact tables: per (pair, end)
    contacts = []
    for c in sys.contact_groups:
        end = onp.asarray(c.end, onp.float64)  # (np, ne, 3)
        radius = onp.asarray(c.radius, onp.float64)
        friction = onp.asarray(c.com.friction, onp.float64)
        elasticity = onp.asarray(c.com.elasticity, onp.float64)
        for pidx in range(end.shape[0]):
            a_idx = int(c.com.body_a.a[pidx])
            b_idx = int(c.com.body_b.a[pidx])
            for e in range(end.shape[1]):
                contacts.append(
                    dict(
                        a=a_idx,
                        b=b_idx,
                        end=tuple(map(f, end[pidx, e])),
                        radius=f(radius[pidx]),
                        friction=f(friction[pidx]),
                        elasticity=f(elasticity[pidx]),
                        mass_a=f(mass[a_idx]),
                        inertia_a=tuple(map(f, inv_inertia[a_idx])),
                    )
                )

    n_substeps = sys.substeps // 2

    def body_vecs(arr, b, width):
        return tuple(arr[b, k] for k in range(width))

    def actuator_joint_damp_dp(pos, rot, vel, ang, act):
        """Accumulated acceleration-level dp (actuators + joint damping).

        Only angular contributions exist on this path (torque actuators and
        joint damping produce no linear force)."""
        dang_acc = {}

        def add_ang(b, v):
            if b in dang_acc:
                dang_acc[b] = _vadd(dang_acc[b], v)
            else:
                dang_acc[b] = v

        # joint angular damping (joints.damp)
        for jd in joints:
            tq = _vscale(_vsub(ang[jd["p"]], ang[jd["c"]]), -jd["angular_damping"])
            add_ang(jd["p"], _vmul(tq, jd["inertia_p"]))
            add_ang(jd["c"], _vscale(_vmul(tq, jd["inertia_c"]), -1.0))

        # torque actuators (actuators.apply, kind == 'torque')
        for ac in actuators:
            jd = joints[ac["j"]]
            rot_p, rot_c = rot[jd["p"]], rot[jd["c"]]
            axis = _rotate(jd["axis_p"][0], rot_p)
            ref_p = _rotate(jd["axis_p"][2], rot_p)
            ref_c = _rotate(jd["axis_c"][2], rot_c)
            psi = _signed_angle(axis, ref_p, ref_c)
            torque_scalar = act[ac["act"]] * (-ac["strength"])
            torque_scalar = jnp.where(psi < jd["lo"], 0.0, torque_scalar)
            torque_scalar = jnp.where(psi > jd["hi"], 0.0, torque_scalar)
            tq = _vscale(axis, torque_scalar)
            add_ang(jd["p"], _vmul(tq, jd["inertia_p"]))
            add_ang(jd["c"], _vscale(_vmul(tq, jd["inertia_c"]), -1.0))

        zero = jnp.zeros_like(act[0])
        out = []
        for b in range(nb):
            out.append(dang_acc.get(b, (zero, zero, zero)))
        return out

    def pbd_joint_dq(pos, rot):
        """Position-level joint projection (joints.pbd_apply, revolute)."""
        zero = jnp.zeros_like(pos[0][0])
        dpos = [None] * nb
        drot = [None] * nb

        def add(acc, b, v):
            acc[b] = v if acc[b] is None else _vadd(acc[b], v)

        for jd in joints:
            bp, bc = jd["p"], jd["c"]
            rot_p, rot_c = rot[bp], rot[bc]
            pos_bp, pos_bc = pos[bp], pos[bc]
            pos_p = _vadd(pos_bp, _rotate(jd["off_p"], rot_p))
            pos_c = _vadd(pos_bc, _rotate(jd["off_c"], rot_c))

            # positional update (joints._position_update)
            dx = _vsub(pos_p, pos_c)
            arm_p = _vsub(pos_p, pos_bp)
            arm_c = _vsub(pos_c, pos_bc)
            cmag = _vnorm_safe(dx)
            n = _vscale(dx, 1.0 / (cmag + 1e-6))
            cr1 = _vcross(arm_p, n)
            w1 = 1.0 / jd["mass_p"] + _vdot(cr1, _vmul(cr1, jd["inertia_p"]))
            cr2 = _vcross(arm_c, n)
            w2 = 1.0 / jd["mass_c"] + _vdot(cr2, _vmul(cr2, jd["inertia_c"]))
            dlambda = -cmag / (w1 + w2 + 1e-6)
            p = _vscale(n, dlambda)
            sp = jd["scale_pos"]
            dq_p_pos = _vscale(p, sp / jd["mass_p"])
            dq_c_pos = _vscale(p, -sp / jd["mass_c"])
            qp_rot = _vec_qmul(_vmul(_vcross(arm_p, p), jd["inertia_p"]), rot_p)
            qc_rot = _vec_qmul(_vmul(_vcross(arm_c, p), jd["inertia_c"]), rot_c)
            dq_p_rot = tuple(0.5 * sp * x for x in qp_rot)
            dq_c_rot = tuple(-0.5 * sp * x for x in qc_rot)

            # revolute angle rows
            axis = _rotate(jd["axis_p"][0], rot_p)
            ref_p = _rotate(jd["axis_p"][2], rot_p)
            ref_c = _rotate(jd["axis_c"][2], rot_c)
            psi = _signed_angle(axis, ref_p, ref_c)
            axis_c_x = _rotate(jd["axis_c"][0], rot_c)
            dq_1 = _vcross(axis, axis_c_x)
            ph = jnp.clip(psi, jd["lo"], jd["hi"])
            half = ph / 2.0
            fixrot = (jnp.cos(half), axis[0] * jnp.sin(half), axis[1] * jnp.sin(half), axis[2] * jnp.sin(half))
            n1 = _rotate(ref_p, fixrot)
            dq_2 = _vcross(n1, ref_c)

            sa = jd["scale_ang"]
            ap = (0.0, 0.0, 0.0, 0.0)
            acs = (0.0, 0.0, 0.0, 0.0)
            rot_updates_p = []
            rot_updates_c = []
            for dq_ang in (dq_1, dq_2):
                th = _vnorm_safe(dq_ang)
                nn = _vscale(dq_ang, 1.0 / (th + 1e-6))
                w1a = _vdot(nn, _vmul(nn, jd["inertia_p"]))
                w2a = _vdot(nn, _vmul(nn, jd["inertia_c"]))
                dl = -th / (w1a + w2a + 1e-6)
                pa = _vscale(nn, -dl)
                qp_r = _vec_qmul(_vmul(pa, jd["inertia_p"]), rot_p)
                qc_r = _vec_qmul(_vmul(pa, jd["inertia_c"]), rot_c)
                rot_updates_p.append(tuple(0.5 * sa * x for x in qp_r))
                rot_updates_c.append(tuple(-0.5 * sa * x for x in qc_r))
            sum_p = tuple(a + b for a, b in zip(*rot_updates_p))
            sum_c = tuple(a + b for a, b in zip(*rot_updates_c))
            dq_p_rot = tuple(a + b for a, b in zip(dq_p_rot, sum_p))
            dq_c_rot = tuple(a + b for a, b in zip(dq_c_rot, sum_c))

            add(dpos, bp, dq_p_pos)
            add(dpos, bc, dq_c_pos)
            add(drot, bp, dq_p_rot)
            add(drot, bc, dq_c_rot)

        z3 = (zero, zero, zero)
        z4 = (zero, zero, zero, zero)
        return (
            [d if d is not None else z3 for d in dpos],
            [d if d is not None else z4 for d in drot],
        )

    def contact_position_pass(pos, rot, prev_pos, prev_rot):
        """One-way capsule-plane PBD position contacts.

        Returns (dpos, drot per body, per-contact dlambda list, contact data).
        """
        # per-body accumulators + contact counts for averaging
        acc_pos = [None] * nb
        acc_rot = [None] * nb
        counts = [None] * nb
        per_contact = []

        for cd in contacts:
            a = cd["a"]
            pos_a, rot_a = pos[a], rot[a]
            cap_end = _vadd(pos_a, _rotate(cd["end"], rot_a))
            # plane body is frozen at origin with identity rotation in all
            # our scenes; normal is +z, plane height = pos[b].z
            nrm = (jnp.zeros_like(pos_a[0]), jnp.zeros_like(pos_a[0]), jnp.ones_like(pos_a[0]))
            cpos = _vsub(cap_end, _vscale(nrm, cd["radius"]))
            pen = _vdot(_vsub(pos[cd["b"]], cpos), nrm)

            # one-way position contact
            c = -pen
            arm_p = _vsub(cpos, pos_a)
            # pos_c = cpos + nrm * pen; dx = -nrm*pen; c = dot(dx, n) = -pen
            cr1 = _vcross(arm_p, nrm)
            w1 = 1.0 / cd["mass_a"] + _vdot(cr1, _vmul(cr1, cd["inertia_a"]))
            dlambda = -c / (w1 + 1e-6)
            coll_mask = jnp.where(c < 0, 1.0, 0.0)
            p = _vscale(nrm, dlambda * coll_mask)

            dq_pos = _vscale(p, cs / cd["mass_a"])
            q_r = _vec_qmul(_vmul(_vcross(arm_p, p), cd["inertia_a"]), rot_a)
            dq_rot = tuple(cs * 0.5 * x for x in q_r)

            # static friction
            q1inv = _qinv(rot_a)
            r1 = _rotate(_vsub(cpos, pos_a), q1inv)
            p1bar = _vadd(prev_pos[a], _rotate(r1, prev_rot[a]))
            deltap = _vsub(cpos, p1bar)
            dp_n = _vdot(deltap, nrm)
            deltap_t = _vsub(deltap, _vscale(nrm, dp_n))
            ct = _vnorm_safe(deltap_t)
            nt = _vscale(deltap_t, 1.0 / (ct + 1e-6))
            cr1t = _vcross(arm_p, nt)
            w1t = 1.0 / cd["mass_a"] + _vdot(cr1t, _vmul(cr1t, cd["inertia_a"]))
            dlambdat = -ct / w1t
            static_mask = jnp.where(
                jnp.abs(dlambdat) < jnp.abs(cd["friction"] * dlambda), 1.0, 0.0
            )
            pt = _vscale(nt, dlambdat * static_mask * coll_mask)
            dq_pos = _vadd(dq_pos, _vscale(pt, cs / cd["mass_a"]))
            q_rt = _vec_qmul(_vmul(_vcross(arm_p, pt), cd["inertia_a"]), rot_a)
            dq_rot = tuple(a_ + cs * 0.5 * x for a_, x in zip(dq_rot, q_rt))

            # contact counts: nonzero positional update
            nonzero = jnp.where(
                (dq_pos[0] != 0) | (dq_pos[1] != 0) | (dq_pos[2] != 0), 1.0, 0.0
            )
            if acc_pos[a] is None:
                acc_pos[a] = dq_pos
                acc_rot[a] = dq_rot
                counts[a] = nonzero
            else:
                acc_pos[a] = _vadd(acc_pos[a], dq_pos)
                acc_rot[a] = tuple(x + y for x, y in zip(acc_rot[a], dq_rot))
                counts[a] = counts[a] + nonzero

            per_contact.append(
                dict(cd=cd, pos=cpos, normal=nrm, penetration=pen,
                     dlambda=dlambda * coll_mask)
            )

        zero = jnp.zeros_like(pos[0][0])
        dpos, drot = [], []
        for b in range(nb):
            if acc_pos[b] is None:
                dpos.append((zero, zero, zero))
                drot.append((zero, zero, zero, zero))
            else:
                denom = 1e-6 + counts[b]
                dpos.append(tuple(x / denom for x in acc_pos[b]))
                drot.append(tuple(x / denom for x in acc_rot[b]))
        return dpos, drot, per_contact

    def contact_velocity_pass(pos, rot, vel, ang, prev_pos, prev_vel, prev_ang, per_contact):
        """One-way PBD velocity contacts (dynamic friction + restitution)."""
        acc_vel = [None] * nb
        acc_ang = [None] * nb
        counts = [None] * nb

        for pc in per_contact:
            cd = pc["cd"]
            a = cd["a"]
            cpos, nrm, pen, dlambda = pc["pos"], pc["normal"], pc["penetration"], pc["dlambda"]
            pos_a = pos[a]
            arm = _vsub(cpos, pos_a)
            rel_vel = _vadd(vel[a], _vcross(ang[a], arm))
            v_n = _vdot(rel_vel, nrm)
            v_t = _vsub(rel_vel, _vscale(nrm, v_n))
            v_t_norm = _vnorm_safe(v_t)
            v_t_dir = _vscale(v_t, 1.0 / (1e-6 + v_t_norm))

            dvel_mag = -jnp.minimum(
                cd["friction"] * jnp.abs(dlambda) / (2.0 * h), v_t_norm
            )
            dvel = _vscale(v_t_dir, dvel_mag)
            angw = _vcross(arm, v_t_dir)
            w = 1.0 / cd["mass_a"] + _vdot(angw, angw)
            p_dyn = _vscale(dvel, 1.0 / (w + 1e-6))

            arm_old = _vsub(cpos, prev_pos[a])
            rel_vel_old = _vadd(prev_vel[a], _vcross(prev_ang[a], arm_old))
            v_n_old = _vdot(rel_vel_old, nrm)

            rest_mag = -v_n - jnp.minimum(cd["elasticity"] * v_n_old, 0.0)
            dv_rest = _vscale(nrm, rest_mag)
            c = _vnorm_safe(dv_rest)
            nr = _vscale(dv_rest, 1.0 / (c + 1e-6))
            cr1 = _vcross(arm, nr)
            w1r = 1.0 / cd["mass_a"] + _vdot(cr1, _vmul(cr1, cd["inertia_a"]))
            dlambda_rest = c / (w1r + 1e-6)
            sinking = jnp.where(v_n_old <= -vel_threshold, 1.0, 0.0)

            static_mask = jnp.where(pen > 0, 1.0, 0.0)
            p = tuple(
                (dlambda_rest * sinking * n_ + pd) * static_mask
                for n_, pd in zip(nr, p_dyn)
            )

            dvel_out = _vscale(p, 1.0 / cd["mass_a"])
            dang_out = _vcross(_vmul(arm, cd["inertia_a"]), p)

            nonzero = jnp.where(
                (dvel_out[0] != 0) | (dvel_out[1] != 0) | (dvel_out[2] != 0), 1.0, 0.0
            )
            if acc_vel[a] is None:
                acc_vel[a], acc_ang[a], counts[a] = dvel_out, dang_out, nonzero
            else:
                acc_vel[a] = _vadd(acc_vel[a], dvel_out)
                acc_ang[a] = _vadd(acc_ang[a], dang_out)
                counts[a] = counts[a] + nonzero

        zero = jnp.zeros_like(pos[0][0])
        dvel, dang = [], []
        for b in range(nb):
            if acc_vel[b] is None:
                dvel.append((zero, zero, zero))
                dang.append((zero, zero, zero))
            else:
                denom = 1e-6 + counts[b]
                dvel.append(tuple(x / denom for x in acc_vel[b]))
                dang.append(tuple(x / denom for x in acc_ang[b]))
        return dvel, dang

    # ----- integrator pieces -----

    def update_acc(vel, ang, dang_list):
        nvel, nang = [], []
        for b in range(nb):
            v = tuple(
                (vel_decay * vel[b][k] + gravity[k] * dt) * f(pos_mask[b][k])
                for k in range(3)
            )
            a_ = tuple(
                (ang_decay * ang[b][k] + dang_list[b][k] * dt) * f(rot_mask[b][k])
                for k in range(3)
            )
            nvel.append(v)
            nang.append(a_)
        return nvel, nang

    def kinetic(pos, rot, vel, ang):
        npos, nrot = [], []
        for b in range(nb):
            p = tuple(pos[b][k] + vel[b][k] * dt * f(pos_mask[b][k]) for k in range(3))
            am = tuple(ang[b][k] * f(rot_mask[b][k]) for k in range(3))
            dq = _qmul((jnp.zeros_like(am[0]), am[0] * 0.5 * dt, am[1] * 0.5 * dt, am[2] * 0.5 * dt), rot[b])
            r = tuple(rot[b][k] + dq[k] for k in range(4))
            inv_n = jax.lax.rsqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3])
            nrot.append(tuple(x * inv_n for x in r))
            npos.append(p)
        return npos, nrot

    def update_pos(pos, rot, dpos, drot):
        npos, nrot = [], []
        for b in range(nb):
            npos.append(
                tuple(pos[b][k] + dpos[b][k] * f(pos_mask[b][k]) for k in range(3))
            )
            nrot.append(
                tuple(rot[b][k] + drot[b][k] * f(quat_mask[b][k]) for k in range(4))
            )
        return npos, nrot

    def velocity_projection(pos, rot, prev_pos, prev_rot):
        nvel, nang, nrot = [], [], []
        for b in range(nb):
            r = rot[b]
            inv_n = jax.lax.rsqrt(r[0] * r[0] + r[1] * r[1] + r[2] * r[2] + r[3] * r[3])
            new_rot = tuple(x * inv_n for x in r)
            v = tuple(
                (pos[b][k] - prev_pos[b][k]) / dt * f(pos_mask[b][k]) for k in range(3)
            )
            dq = _qmul(new_rot, _qinv(prev_rot[b]))
            sgn = jnp.where(dq[0] >= 0.0, 1.0, -1.0)
            a_ = tuple(
                sgn * f(rot_mask[b][k]) * (2.0 * dq[1 + k] / dt) * f(rot_mask[b][k])
                for k in range(3)
            )
            nvel.append(v)
            nang.append(a_)
            nrot.append(new_rot)
        return nrot, nvel, nang

    def half_substep(pos, rot, vel, ang, act, with_contacts, contact_vel_acc, contact_ang_acc):
        prev = (pos, rot, vel, ang)
        dang = actuator_joint_damp_dp(pos, rot, vel, ang, act)
        vel, ang = update_acc(vel, ang, dang)
        pos, rot = kinetic(pos, rot, vel, ang)
        dpos_j, drot_j = pbd_joint_dq(pos, rot)
        pos, rot = update_pos(pos, rot, dpos_j, drot_j)

        if not with_contacts:
            rot, vel, ang = velocity_projection(pos, rot, prev[0], prev[1])[0:3]
            return pos, rot, vel, ang, contact_vel_acc, contact_ang_acc

        dpos_c, drot_c, per_contact = contact_position_pass(pos, rot, prev[0], prev[1])
        pos, rot = update_pos(pos, rot, dpos_c, drot_c)
        # the restitution pass reads "right before projection" state (parity:
        # system.py _pbd_step qp_right_before): current pos, pre-projection
        # vel/ang
        rb_pos, rb_vel, rb_ang = pos, vel, ang
        rot_n, vel_n, ang_n = velocity_projection(pos, rot, prev[0], prev[1])
        dvel_c, dang_c = contact_velocity_pass(
            pos, rot_n, vel_n, ang_n, rb_pos, rb_vel, rb_ang, per_contact
        )
        vel_out, ang_out = [], []
        for b in range(nb):
            vel_out.append(
                tuple((vel_n[b][k] + dvel_c[b][k]) * f(pos_mask[b][k]) for k in range(3))
            )
            ang_out.append(
                tuple((ang_n[b][k] + dang_c[b][k]) * f(rot_mask[b][k]) for k in range(3))
            )
        contact_vel_acc = [_vadd(contact_vel_acc[b], dvel_c[b]) for b in range(nb)]
        contact_ang_acc = [_vadd(contact_ang_acc[b], dang_c[b]) for b in range(nb)]
        return pos, rot_n, vel_out, ang_out, contact_vel_acc, contact_ang_acc

    def tile_step(pos_arr, rot_arr, vel_arr, ang_arr, act_arr):
        pos = [body_vecs(pos_arr, b, 3) for b in range(nb)]
        rot = [body_vecs(rot_arr, b, 4) for b in range(nb)]
        vel = [body_vecs(vel_arr, b, 3) for b in range(nb)]
        ang = [body_vecs(ang_arr, b, 3) for b in range(nb)]
        act = tuple(act_arr[k] for k in range(act_arr.shape[0]))

        zero = jnp.zeros_like(pos[0][0])
        cva = [(zero, zero, zero) for _ in range(nb)]
        caa = [(zero, zero, zero) for _ in range(nb)]
        for _ in range(n_substeps):
            pos, rot, vel, ang, cva, caa = half_substep(pos, rot, vel, ang, act, False, cva, caa)
            pos, rot, vel, ang, cva, caa = half_substep(pos, rot, vel, ang, act, True, cva, caa)

        def stack(rows, width):
            return jnp.stack([jnp.stack(r[:width], axis=0) for r in rows], axis=0)

        return (
            stack(pos, 3), stack(rot, 4), stack(vel, 3), stack(ang, 3),
            stack(cva, 3), stack(caa, 3),
        )

    return tile_step


def build_step_fn(sys: System, num_envs: int, tile: int = 512):
    """Batched physics step: (QP[N], act[N, na]) -> (QP[N], Info).

    Uses the fused Pallas kernel when `supported(sys)` (TPU), else falls back
    to the vmapped jnp step.  Info carries the accumulated contact impulses
    (contact .vel/.ang), actuator/joint fields zero (no current env reads
    them), and empty contact-point debug arrays.
    """
    if not supported(sys) or jax.default_backend() not in ("tpu", "axon"):
        def fallback(qp, act):
            return jax.vmap(sys.step, in_axes=(0, 0))(qp, act)

        return fallback

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = min(tile, num_envs)
    assert num_envs % tile == 0
    nb = sys.num_bodies
    na = sys.num_joint_dof + sys.num_forces_dof
    tile_step = _build_tile_step(sys)

    def kernel(pos_ref, rot_ref, vel_ref, ang_ref, act_ref,
               opos_ref, orot_ref, ovel_ref, oang_ref, ocv_ref, oca_ref):
        outs = tile_step(pos_ref[:], rot_ref[:], vel_ref[:], ang_ref[:], act_ref[:])
        for ref, o in zip((opos_ref, orot_ref, ovel_ref, oang_ref, ocv_ref, oca_ref), outs):
            ref[:] = o

    def spec(rows, width):
        return pl.BlockSpec(
            (rows, width, tile), lambda i: (0, 0, i), memory_space=pltpu.VMEM
        )

    grid = (num_envs // tile,)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec(nb, 3), spec(nb, 4), spec(nb, 3), spec(nb, 3),
                  pl.BlockSpec((na, tile), lambda i: (0, i), memory_space=pltpu.VMEM)],
        out_specs=[spec(nb, 3), spec(nb, 4), spec(nb, 3), spec(nb, 3),
                   spec(nb, 3), spec(nb, 3)],
        out_shape=[
            jax.ShapeDtypeStruct((nb, 3, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 4, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3, num_envs), jnp.float32),
            jax.ShapeDtypeStruct((nb, 3, num_envs), jnp.float32),
        ],
    )

    from brax_tpu.sim.types import DP

    def step(qp: QP, act):
        # (N, nb, C) -> (nb, C, N) rows-in-lanes layout
        t = lambda x: jnp.transpose(x, (1, 2, 0))
        outs = call(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act.T)
        u = lambda x: jnp.transpose(x, (2, 0, 1))
        qp_out = QP(pos=u(outs[0]), rot=u(outs[1]), vel=u(outs[2]), ang=u(outs[3]))
        zero = jnp.zeros_like(qp_out.pos)
        n = qp.pos.shape[0]
        info = Info(
            contact=DP(vel=u(outs[4]), ang=u(outs[5])),
            joint=DP(vel=zero, ang=zero),
            actuator=DP(vel=zero, ang=zero),
            contact_pos=jnp.zeros((n, 1, 3)),
            contact_normal=jnp.zeros((n, 1, 3)),
            contact_penetration=-jnp.ones((n, 1)),
        )
        return qp_out, info

    return step


# ---------------------------------------------------------------------------
# transparent dispatch: env code calls sys.step per-env; under vmap the
# custom batching rule reroutes the whole batch into the fused kernel
# ---------------------------------------------------------------------------

_ENABLED = False
_STEP_CACHE = {}
_CUSTOM_CACHE = {}


def enable(on: bool = True):
    """Globally enables the fused-kernel dispatch for vmapped sys.step.

    Opt-in: the kernel matches the jnp path to float32 round-off but is not
    differentiable, so APG must leave it off.  Rollout-only consumers (bench,
    PPO/SAC/ES/ARS acting) can turn it on.
    """
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def custom_step_for(sys: System):
    """Returns a (qp, act) -> (qp, info) step bound to this concrete System.

    Unbatched calls run the jnp path; under vmap the custom batching rule
    reroutes the whole batch into the fused Pallas kernel (when supported on
    this backend), else falls back to plain vmap.  The System must be a
    concrete (non-traced) pytree: its parameters bake into the kernel.
    """
    key = id(sys)
    hit = _CUSTOM_CACHE.get(key)
    if hit is not None:
        return hit[1]

    from jax import custom_batching

    from brax_tpu.sim import system as system_mod

    @custom_batching.custom_vmap
    def custom_step(qp, act):
        return system_mod._raw_step(sys, qp, act)

    @custom_step.def_vmap
    def _vmap_rule(axis_size, in_batched, qp, act):
        qp_batched = all(jax.tree_util.tree_leaves(in_batched[0]))
        act_batched = in_batched[1]
        out_batched = (
            jax.tree_util.tree_map(lambda _: True, qp),
            jax.tree_util.tree_map(lambda _: True, system_mod.zero_info(sys)),
        )
        if (
            qp_batched
            and act_batched
            and supported(sys)
            and axis_size % 128 == 0
            and jax.default_backend() == "tpu"
        ):
            fn = _STEP_CACHE.get((key, axis_size))
            if fn is None:
                fn = build_step_fn(
                    sys, axis_size,
                    tile=256 if axis_size % 256 == 0 else axis_size,
                )
                _STEP_CACHE[(key, axis_size)] = fn
            out = fn(qp, act)
            return out, out_batched
        out = jax.vmap(system_mod._raw_step, in_axes=(None, 0, 0))(sys, qp, act)
        return out, out_batched

    # hold a strong ref to sys so id() stays unique while cached
    _CUSTOM_CACHE[key] = (sys, custom_step)
    return custom_step
