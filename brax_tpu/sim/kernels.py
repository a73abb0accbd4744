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

Covers: PBD mode, revolute + spherical joints, torque + angle (PD)
actuators, thruster/twister forces, capsule-plane, one-way box-plane, and
capsule-capsule contacts — the whole standard env suite (ant, humanoid,
grasp, ur5e, fetch, ...).  Under `jax.grad`, a custom VJP re-derives the
backward pass through the jnp reference step (see `_with_vjp`), so fused
rollouts stay differentiable.
"""

from __future__ import annotations

import functools
import math as pymath
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.sim import colliders as colliders_mod
from brax_tpu.sim.lowering import VMEM_LIMIT_BYTES
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
    if sys.dynamics_mode not in ("pbd", "legacy_spring"):
        return False
    if sys.collider_cutoff:
        return False  # dynamic pair culling needs traced gathers
    for g in sys.joint_groups:
        if g.kind not in (
            "revolute",
            "spherical",
            "spring_revolute",
            "spring_universal",
            "spring_spherical",
        ):
            return False
    for a in sys.actuator_groups:
        if a.kind not in ("torque", "angle"):
            return False
    for fo in sys.force_groups:
        if fo.kind not in ("thruster", "twister"):
            return False
    for c in sys.contact_groups:
        if not isinstance(
            c,
            (
                colliders_mod.CapsulePlane,
                colliders_mod.BoxPlane,
                colliders_mod.CapsuleCapsule,
            ),
        ):
            return False
        if isinstance(c, colliders_mod.BoxPlane) and not c.com.one_way:
            return False
    return True


# ---------------------------------------------------------------------------
# the fused step, built per System (all params baked as literals)
# ---------------------------------------------------------------------------


# substep loops with at least this many iterations compile rolled
# (lax.fori_loop) instead of unrolled — see tile_step below.  6 keeps the
# benchmarked ant PBD step (n_substeps=5, 24M env-steps/s unrolled) on its
# measured form while rolling the spring kernels whose unrolled Mosaic
# compile took ~20 min.
_ROLL_MIN = 6


def _build_tile_step(sys: System, roll_substeps=None):
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
    baumgarte_erp = f(sys.solver.baumgarte_erp)

    # joint tables (all revolute; checked by supported())
    joints = []
    for g in sys.joint_groups:
        off_p = onp.asarray(g.off_p, onp.float64)
        off_c = onp.asarray(g.off_c, onp.float64)
        axis_p = onp.asarray(g.axis_p, onp.float64)  # (nj, 3, 3)
        axis_c = onp.asarray(g.axis_c, onp.float64)
        limit = onp.asarray(g.limit, onp.float64)  # (nj, dof, 2)
        ad = onp.asarray(g.angular_damping, onp.float64)
        sp = onp.asarray(g.scale_pos, onp.float64)
        sa = onp.asarray(g.scale_ang, onp.float64)
        spring = g.kind.startswith("spring_")
        stiffness = onp.asarray(g.stiffness, onp.float64) if spring else None
        sdamp = onp.asarray(g.spring_damping, onp.float64) if spring else None
        lstr = onp.asarray(g.limit_strength, onp.float64) if spring else None
        for j in range(g.n):
            joints.append(
                dict(
                    kind=g.kind,
                    dof=g.dof,
                    p=int(g.parent.a[j]),
                    c=int(g.child.a[j]),
                    off_p=tuple(map(f, off_p[j])),
                    off_c=tuple(map(f, off_c[j])),
                    axis_p=[tuple(map(f, axis_p[j][k])) for k in range(3)],
                    axis_c=[tuple(map(f, axis_c[j][k])) for k in range(3)],
                    limits=[(f(limit[j, d, 0]), f(limit[j, d, 1])) for d in range(g.dof)],
                    lo=f(limit[j, 0, 0]),
                    hi=f(limit[j, 0, 1]),
                    angular_damping=f(ad[j]),
                    scale_pos=f(sp[j]),
                    scale_ang=f(sa[j]),
                    mass_p=f(mass[int(g.parent.a[j])]),
                    mass_c=f(mass[int(g.child.a[j])]),
                    inertia_p=tuple(map(f, inv_inertia[int(g.parent.a[j])])),
                    inertia_c=tuple(map(f, inv_inertia[int(g.child.a[j])])),
                    stiffness=f(stiffness[j]) if spring else 0.0,
                    spring_damping=f(sdamp[j]) if spring else 0.0,
                    limit_strength=f(lstr[j]) if spring else 0.0,
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
                    kind=a.kind,
                    j=joint_base[a.group_index] + int(a.joint_sel.a[k]),
                    acts=[int(i) for i in a.act_index.a[k]],  # -1 = padded dof
                    strength=f(strength[k]),
                )
            )

    forces = []
    for fo in sys.force_groups:
        strength = onp.asarray(fo.strength, onp.float64)
        fmass = onp.asarray(fo.mass, onp.float64)
        na_total = sys.num_joint_dof + sys.num_forces_dof
        for k in range(fo.n):
            forces.append(
                dict(
                    kind=fo.kind,
                    body=int(fo.body.a[k]),
                    # clip-gather parity with jumpy.take (actuators.force_apply)
                    acts=[min(max(int(i), 0), na_total - 1) for i in fo.act_index.a[k]],
                    strength=f(strength[k]),
                    mass=f(fmass[k]),
                )
            )

    # contact tables: one entry per (pair, manifold point)
    contacts = []
    for grp_idx, c in enumerate(sys.contact_groups):
        friction = onp.asarray(c.com.friction, onp.float64)
        elasticity = onp.asarray(c.com.elasticity, onp.float64)
        n_pairs = len(c.com.body_a.a)
        for pidx in range(n_pairs):
            a_idx = int(c.com.body_a.a[pidx])
            b_idx = int(c.com.body_b.a[pidx])
            base_entry = dict(
                grp=grp_idx,
                a=a_idx,
                b=b_idx,
                one_way=bool(c.com.one_way),
                friction=f(friction[pidx]),
                elasticity=f(elasticity[pidx]),
                mass_a=f(mass[a_idx]),
                inertia_a=tuple(map(f, inv_inertia[a_idx])),
                mass_b=f(mass[b_idx]),
                inertia_b=tuple(map(f, inv_inertia[b_idx])),
            )
            if isinstance(c, colliders_mod.CapsulePlane):
                end = onp.asarray(c.end, onp.float64)
                radius = onp.asarray(c.radius, onp.float64)
                for e in range(end.shape[1]):
                    contacts.append(
                        dict(
                            base_entry,
                            kind="cap_plane",
                            end=tuple(map(f, end[pidx, e])),
                            radius=f(radius[pidx]),
                        )
                    )
            elif isinstance(c, colliders_mod.BoxPlane):
                corner = onp.asarray(c.corner, onp.float64)  # (np, 8, 3)
                for e in range(corner.shape[1]):
                    contacts.append(
                        dict(
                            base_entry,
                            kind="cap_plane",  # corner == zero-radius cap end
                            end=tuple(map(f, corner[pidx, e])),
                            radius=0.0,
                        )
                    )
            elif isinstance(c, colliders_mod.CapsuleCapsule):
                contacts.append(
                    dict(
                        base_entry,
                        kind="cap_cap",
                        end_a=tuple(map(f, onp.asarray(c.end_a, onp.float64)[pidx])),
                        off_a=tuple(map(f, onp.asarray(c.off_a, onp.float64)[pidx])),
                        radius_a=f(onp.asarray(c.radius_a, onp.float64)[pidx]),
                        end_b=tuple(map(f, onp.asarray(c.end_b, onp.float64)[pidx])),
                        off_b=tuple(map(f, onp.asarray(c.off_b, onp.float64)[pidx])),
                        radius_b=f(onp.asarray(c.radius_b, onp.float64)[pidx]),
                    )
                )
            else:
                raise NotImplementedError(type(c))

    n_substeps = sys.substeps // 2

    def body_vecs(arr, b, width):
        return tuple(arr[b, k] for k in range(width))

    def _acos(x):
        # Mosaic has no acos; acos(x) = atan2(sqrt(1-x^2), x)
        xc = jnp.clip(x, -1.0, 1.0)
        return _arctan2(jnp.sqrt(jnp.maximum(1.0 - xc * xc, 0.0)), xc)

    def _normalize(v, eps):
        n = _vnorm_safe(v)
        return _vscale(v, 1.0 / (eps + n)), n

    def joint_axes_angles(jd, rot_p, rot_c):
        """axis_angle parity (joints.axis_angle): per-dof axes + angles."""
        a_p = [_rotate(jd["axis_p"][k], rot_p) for k in range(3)]
        a_c = [_rotate(jd["axis_c"][k], rot_c) for k in range(3)]
        if jd["kind"] in ("revolute", "spring_revolute"):
            psi = _signed_angle(a_p[0], a_p[2], a_c[2])
            return [a_p[0]], [psi]
        # universal/spherical (line-of-nodes x-y'-z'' euler), joints.py:142-164
        line, _ = _normalize(_vcross(a_c[2], a_p[0]), 1e-10)
        psi = _signed_angle(a_p[0], a_p[1], line)
        in_xz = _vadd(
            _vscale(a_c[0], _vdot(a_p[0], a_c[0])),
            _vscale(a_c[1], _vdot(a_p[0], a_c[1])),
        )
        in_xz, _ = _normalize(in_xz, 1e-10)
        ang_between = _vdot(in_xz, a_p[0])
        theta = _acos(ang_between) * jnp.sign(_vdot(a_p[0], a_c[2]))
        if jd["kind"] == "spring_universal":
            return [a_p[0], a_c[1]], [psi, theta]
        neg_a3c = _vscale(a_c[2], -1.0)
        phi = _signed_angle(neg_a3c, a_c[1], line)
        return [a_p[0], a_c[1], a_c[2]], [psi, theta, phi]

    def actuator_joint_damp_dp(pos, rot, vel, ang, act, joint_damp=True):
        """Accumulated acceleration-level dp: joint damping, torque/angle
        actuators (angular), thruster/twister forces (linear/angular)."""
        dang_acc = {}
        dvel_acc = {}

        def add(acc, b, v):
            acc[b] = v if b not in acc else _vadd(acc[b], v)

        # joint angular damping (joints.damp); spring mode folds its angular
        # damping into the spring torque instead
        for jd in joints if joint_damp else ():
            tq = _vscale(_vsub(ang[jd["p"]], ang[jd["c"]]), -jd["angular_damping"])
            add(dang_acc, jd["p"], _vmul(tq, jd["inertia_p"]))
            add(dang_acc, jd["c"], _vscale(_vmul(tq, jd["inertia_c"]), -1.0))

        # actuators (actuators.apply)
        for ac in actuators:
            jd = joints[ac["j"]]
            rot_p, rot_c = rot[jd["p"]], rot[jd["c"]]
            axes, angles = joint_axes_angles(jd, rot_p, rot_c)
            zero = jnp.zeros_like(act[0])
            tq = (zero, zero, zero)
            for d in range(jd["dof"]):
                lo, hi = jd["limits"][d]
                a_idx = ac["acts"][d]
                act_d = act[a_idx] if a_idx >= 0 else zero
                if ac["kind"] == "torque":
                    ts = act_d * (-ac["strength"])
                    ts = jnp.where(angles[d] < lo, 0.0, ts)
                    ts = jnp.where(angles[d] > hi, 0.0, ts)
                else:  # angle (PD to target; padded dofs PD toward 0)
                    target = jnp.clip(act_d * (pymath.pi / 180.0), lo, hi)
                    ts = (target - angles[d]) * ac["strength"]
                tq = _vadd(tq, _vscale(axes[d], ts))
            if ac["kind"] == "torque":
                add(dang_acc, jd["p"], _vmul(tq, jd["inertia_p"]))
                add(dang_acc, jd["c"], _vscale(_vmul(tq, jd["inertia_c"]), -1.0))
            else:  # angle actuators push the parent opposite (actuators.py)
                add(dang_acc, jd["p"], _vscale(_vmul(tq, jd["inertia_p"]), -1.0))
                add(dang_acc, jd["c"], _vmul(tq, jd["inertia_c"]))

        # direct forces (actuators.force_apply)
        for fo in forces:
            d3 = tuple(act[i] * (fo["strength"] / fo["mass"]) for i in fo["acts"])
            if fo["kind"] == "thruster":
                add(dvel_acc, fo["body"], d3)
            else:
                add(dang_acc, fo["body"], d3)

        zero = jnp.zeros_like(act[0])
        z3 = (zero, zero, zero)
        return (
            [dvel_acc.get(b, z3) for b in range(nb)],
            [dang_acc.get(b, z3) for b in range(nb)],
        )

    def spring_joint_dp(pos, rot, vel, ang):
        """Acceleration-level spring joint forces (joints.spring_apply)."""
        dang_acc = {}
        dvel_acc = {}

        def add(acc, b, v):
            acc[b] = v if b not in acc else _vadd(acc[b], v)

        for jd in joints:
            bp, bc = jd["p"], jd["c"]
            rot_p, rot_c = rot[bp], rot[bc]
            # anchor world positions/velocities (QP.to_world)
            off_p_w = _rotate(jd["off_p"], rot_p)
            off_c_w = _rotate(jd["off_c"], rot_c)
            pos_p = _vadd(pos[bp], off_p_w)
            pos_c = _vadd(pos[bc], off_c_w)
            vel_p = _vadd(vel[bp], _vcross(ang[bp], off_p_w))
            vel_c = _vadd(vel[bc], _vcross(ang[bc], off_c_w))

            impulse = _vadd(
                _vscale(_vsub(pos_p, pos_c), jd["stiffness"]),
                _vscale(_vsub(vel_p, vel_c), jd["spring_damping"]),
            )
            add(dvel_acc, bp, _vscale(impulse, -1.0 / jd["mass_p"]))
            add(dang_acc, bp, _vmul(_vcross(off_p_w, _vscale(impulse, -1.0)), jd["inertia_p"]))
            add(dvel_acc, bc, _vscale(impulse, 1.0 / jd["mass_c"]))
            add(dang_acc, bc, _vmul(_vcross(off_c_w, impulse), jd["inertia_c"]))

            axes, angles = joint_axes_angles(jd, rot_p, rot_c)
            zero = jnp.zeros_like(pos[0][0])
            if jd["kind"] == "spring_revolute":
                axis, angle = axes[0], angles[0]
                axis_c_x = _rotate(jd["axis_c"][0], rot_c)
                torque = _vscale(_vcross(axis, axis_c_x), jd["stiffness"])
                lo, hi = jd["limits"][0]
                dang = jnp.where(angle < lo, lo - angle, 0.0)
                dang = jnp.where(angle > hi, hi - angle, dang)
                torque = _vsub(torque, _vscale(axis, jd["limit_strength"] * dang))
            elif jd["kind"] == "spring_universal":
                axis_1, axis_2 = axes
                proj = _vsub(axis_2, _vscale(axis_1, _vdot(axis_2, axis_1)))
                proj, _ = _normalize(proj, 0.0)
                torque = _vscale(_vcross(proj, axis_2), jd["limit_strength"] / 5.0)
                for d in range(2):
                    lo, hi = jd["limits"][d]
                    dang = jnp.where(angles[d] < lo, lo - angles[d], 0.0)
                    dang = jnp.where(angles[d] > hi, hi - angles[d], dang)
                    torque = _vsub(
                        torque, _vscale(axes[d], jd["limit_strength"] * dang)
                    )
            else:  # spring_spherical
                torque = (zero, zero, zero)
                for d in range(3):
                    lo, hi = jd["limits"][d]
                    dang = jnp.where(angles[d] < lo, lo - angles[d], 0.0)
                    dang = jnp.where(angles[d] > hi, hi - angles[d], dang)
                    torque = _vsub(
                        torque, _vscale(axes[d], jd["limit_strength"] * dang)
                    )

            torque = _vsub(
                torque,
                _vscale(_vsub(ang[bp], ang[bc]), jd["angular_damping"]),
            )
            add(dang_acc, bp, _vmul(torque, jd["inertia_p"]))
            add(dang_acc, bc, _vscale(_vmul(torque, jd["inertia_c"]), -1.0))

        zero = jnp.zeros_like(pos[0][0])
        z3 = (zero, zero, zero)
        return (
            [dvel_acc.get(b, z3) for b in range(nb)],
            [dang_acc.get(b, z3) for b in range(nb)],
        )

    def contact_spring_pass(pos, rot, vel, ang):
        """Velocity-level spring contact impulses (colliders.spring_apply)."""
        acc_vel = {}
        acc_ang = {}
        counts = {}
        cur_grp = [None]

        def add(bidx, dv, da):
            key = (cur_grp[0], bidx)
            nz = jnp.where((dv[0] != 0) | (dv[1] != 0) | (dv[2] != 0), 1.0, 0.0)
            if key not in acc_vel:
                acc_vel[key], acc_ang[key], counts[key] = dv, da, nz
            else:
                acc_vel[key] = _vadd(acc_vel[key], dv)
                acc_ang[key] = _vadd(acc_ang[key], da)
                counts[key] = counts[key] + nz

        for cd in contacts:
            cur_grp[0] = cd["grp"]
            a, b = cd["a"], cd["b"]
            cpos, nrm, pen = narrowphase(cd, pos, rot, None, None)
            arm_a = _vsub(cpos, pos[a])
            cvel = _vadd(vel[a], _vcross(ang[a], arm_a))
            if not cd["one_way"]:
                arm_b = _vsub(cpos, pos[b])
                cvel = _vsub(cvel, _vadd(vel[b], _vcross(ang[b], arm_b)))

            baumgarte_vel = baumgarte_erp * pen
            normal_vel = _vdot(nrm, cvel)
            temp1 = _vmul(_vcross(arm_a, nrm), cd["inertia_a"])
            if cd["one_way"]:
                ang_w = _vdot(nrm, _vcross(temp1, arm_a))
                denom = 1.0 / cd["mass_a"] + ang_w
            else:
                temp2 = _vmul(_vcross(arm_b, nrm), cd["inertia_b"])
                ang_w = _vdot(
                    nrm, _vadd(_vcross(temp1, arm_a), _vcross(temp2, arm_b))
                )
                denom = 1.0 / cd["mass_a"] + 1.0 / cd["mass_b"] + ang_w

            impulse = (
                -1.0 * (1.0 + cd["elasticity"]) * normal_vel + baumgarte_vel
            ) / denom
            imp_n = _vscale(nrm, impulse)

            vel_d = _vsub(cvel, _vscale(nrm, normal_vel))
            vd_norm = _vnorm_safe(vel_d)
            impulse_d = jnp.minimum(vd_norm / denom, cd["friction"] * impulse)
            dir_d = _vscale(vel_d, 1.0 / (1e-6 + vd_norm))
            imp_d = _vscale(dir_d, -impulse_d)

            apply_n = jnp.where(
                (pen > 0.0) & (normal_vel < 0) & (impulse > 0.0), 1.0, 0.0
            )
            apply_d = apply_n * jnp.where(vd_norm > 0.01, 1.0, 0.0)

            p_total = _vadd(_vscale(imp_n, apply_n), _vscale(imp_d, apply_d))
            add(
                a,
                _vscale(p_total, 1.0 / cd["mass_a"]),
                _vmul(_vcross(arm_a, p_total), cd["inertia_a"]),
            )
            if not cd["one_way"]:
                np_total = _vscale(p_total, -1.0)
                add(
                    b,
                    _vscale(np_total, 1.0 / cd["mass_b"]),
                    _vmul(_vcross(arm_b, np_total), cd["inertia_b"]),
                )

        zero = jnp.zeros_like(pos[0][0])
        dvel_out = [(zero, zero, zero) for _ in range(nb)]
        dang_out = [(zero, zero, zero) for _ in range(nb)]
        for (grp, bidx), acc in acc_vel.items():
            denom = 1e-8 + counts[(grp, bidx)]
            dvel_out[bidx] = _vadd(dvel_out[bidx], tuple(x / denom for x in acc))
            dang_out[bidx] = _vadd(
                dang_out[bidx], tuple(x / denom for x in acc_ang[(grp, bidx)])
            )
        return dvel_out, dang_out

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

            # angle rows (revolute: align + limit; spherical: 3 euler rows)
            if jd["kind"] == "revolute":
                axis = _rotate(jd["axis_p"][0], rot_p)
                ref_p = _rotate(jd["axis_p"][2], rot_p)
                ref_c = _rotate(jd["axis_c"][2], rot_c)
                psi = _signed_angle(axis, ref_p, ref_c)
                axis_c_x = _rotate(jd["axis_c"][0], rot_c)
                dq_1 = _vcross(axis, axis_c_x)
                ph = jnp.clip(psi, jd["lo"], jd["hi"])
                half = ph / 2.0
                fixrot = (jnp.cos(half), axis[0] * jnp.sin(half),
                          axis[1] * jnp.sin(half), axis[2] * jnp.sin(half))
                n1 = _rotate(ref_p, fixrot)
                dq_2 = _vcross(n1, ref_c)
                dq_rows = (dq_1, dq_2)
            else:
                # spherical rows (joints.py pbd_apply spherical branch,
                # 1e-6-eps normalizations)
                a_p = [_rotate(jd["axis_p"][k], rot_p) for k in range(3)]
                a_c = [_rotate(jd["axis_c"][k], rot_c) for k in range(3)]
                line, _ = _normalize(_vcross(a_c[2], a_p[0]), 1e-6)
                in_xz = _vadd(
                    _vscale(a_c[0], _vdot(a_p[0], a_c[0])),
                    _vscale(a_c[1], _vdot(a_p[0], a_c[1])),
                )
                in_xz, _ = _normalize(in_xz, 1e-6)
                a2_normal, _ = _normalize(_vcross(in_xz, a_p[0]), 1e-6)
                sgn = jnp.sign(_vdot(a_p[0], a_c[2]))
                rows = (
                    (a_p[0], a_p[1], line, 0),
                    ((_vscale(a2_normal, -sgn)), a_p[0], in_xz, 1),
                    (a_c[2], line, a_c[1], 2),  # -yc_n_normal == axis_3_c
                )
                dq_rows = []
                for n_, n_1, n_2, lim_i in rows:
                    lo, hi = jd["limits"][lim_i]
                    ph = _signed_angle(n_, n_1, n_2)
                    mask = jnp.where(ph < lo, 1.0, 0.0)
                    mask = jnp.where(ph > hi, 1.0, mask)
                    ph = jnp.clip(ph, lo, hi)
                    half = ph / 2.0
                    fixrot = (jnp.cos(half), n_[0] * jnp.sin(half),
                              n_[1] * jnp.sin(half), n_[2] * jnp.sin(half))
                    n1r = _rotate(n_1, fixrot)
                    dq_rows.append(_vscale(_vcross(n1r, n_2), mask))
                dq_rows = tuple(dq_rows)

            sa = jd["scale_ang"]
            rot_updates_p = []
            rot_updates_c = []
            for dq_ang in dq_rows:
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
            sum_p = tuple(sum(col) for col in zip(*rot_updates_p))
            sum_c = tuple(sum(col) for col in zip(*rot_updates_c))
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

    def _closest_seg_seg(a0, a1, b0, b1):
        """geometry._closest_segment_to_segment_points, scalarized."""
        def seg_point_dist(p0, p1, pt):
            ab = _vsub(p1, p0)
            t = _vdot(_vsub(pt, p0), ab) / (_vdot(ab, ab) + 1e-6)
            cp = _vadd(p0, _vscale(ab, jnp.clip(t, 0.0, 1.0)))
            v = _vsub(pt, cp)
            return cp, _vdot(v, v)

        dir_a = _vsub(a1, a0)
        len_a = _vnorm_safe(dir_a)
        len_a = len_a + 1e-6 * (len_a == 0.0)
        dir_a = _vscale(dir_a, 1.0 / len_a)
        half_a = len_a * 0.5
        dir_b = _vsub(b1, b0)
        len_b = _vnorm_safe(dir_b)
        len_b = len_b + 1e-6 * (len_b == 0.0)
        dir_b = _vscale(dir_b, 1.0 / len_b)
        half_b = len_b * 0.5

        a_mid = _vadd(a0, _vscale(dir_a, half_a))
        b_mid = _vadd(b0, _vscale(dir_b, half_b))
        trans = _vsub(a_mid, b_mid)
        dab = _vdot(dir_a, dir_b)
        dat = _vdot(dir_a, trans)
        dbt = _vdot(dir_b, trans)
        denom = 1.0 - dab * dab
        t_a = jnp.clip((-dat + dab * dbt) / (denom + 1e-6), -half_a, half_a)
        t_b = jnp.clip(dbt + t_a * dab, -half_b, half_b)
        best_a = _vadd(a_mid, _vscale(dir_a, t_a))
        best_b = _vadd(b_mid, _vscale(dir_b, t_b))
        new_a, d1 = seg_point_dist(a0, a1, best_b)
        new_b, d2 = seg_point_dist(b0, b1, best_a)
        lt = d1 < d2
        best_a = tuple(jnp.where(lt, na, ba) for na, ba in zip(new_a, best_a))
        best_b = tuple(jnp.where(lt, bb, nbv) for nbv, bb in zip(new_b, best_b))
        return best_a, best_b

    def narrowphase(cd, pos, rot, vel, ang):
        """Returns (cpos, normal, penetration) for one contact entry."""
        a, b = cd["a"], cd["b"]
        if cd["kind"] == "cap_plane":
            cap_end = _vadd(pos[a], _rotate(cd["end"], rot[a]))
            # plane body: +z normal rotated by (frozen, identity) plane rot
            one = jnp.ones_like(pos[a][0])
            zero = jnp.zeros_like(pos[a][0])
            nrm = _rotate((zero, zero, one), rot[b])
            cpos = _vsub(cap_end, _vscale(nrm, cd["radius"]))
            pen = _vdot(_vsub(pos[b], cpos), nrm)
            return cpos, nrm, pen
        # cap_cap (colliders.CapsuleCapsule.contact)
        pos_ca = _vadd(pos[a], _rotate(cd["off_a"], rot[a]))
        e_a = _rotate(cd["end_a"], rot[a])
        a0, a1 = _vadd(pos_ca, e_a), _vsub(pos_ca, e_a)
        pos_cb = _vadd(pos[b], _rotate(cd["off_b"], rot[b]))
        e_b = _rotate(cd["end_b"], rot[b])
        b0, b1 = _vadd(pos_cb, e_b), _vsub(pos_cb, e_b)
        best_a, best_b = _closest_seg_seg(a0, a1, b0, b1)
        pen_vec = _vsub(best_a, best_b)
        dist = _vnorm_safe(pen_vec)
        nrm = _vscale(pen_vec, 1.0 / (1e-6 + dist))
        pen = cd["radius_a"] + cd["radius_b"] - dist
        cpos = _vscale(_vadd(best_a, best_b), 0.5)
        return cpos, nrm, pen

    def contact_position_pass(pos, rot, prev_pos, prev_rot):
        """PBD position contacts (one-way and two-way).

        Returns (dpos, drot per body, per-contact data for the velocity pass).
        """
        # parity with the jnp path: updates average PER contact GROUP (by that
        # group's per-body contact count), then sum across groups
        acc_pos = {}
        acc_rot = {}
        counts = {}
        per_contact = []
        cur_grp = [None]

        def add(bidx, dq_pos, dq_rot):
            key = (cur_grp[0], bidx)
            nz = jnp.where(
                (dq_pos[0] != 0) | (dq_pos[1] != 0) | (dq_pos[2] != 0), 1.0, 0.0
            )
            if key not in acc_pos:
                acc_pos[key], acc_rot[key], counts[key] = dq_pos, dq_rot, nz
            else:
                acc_pos[key] = _vadd(acc_pos[key], dq_pos)
                acc_rot[key] = tuple(x + y for x, y in zip(acc_rot[key], dq_rot))
                counts[key] = counts[key] + nz

        for cd in contacts:
            cur_grp[0] = cd["grp"]
            a, b = cd["a"], cd["b"]
            cpos, nrm, pen = narrowphase(cd, pos, rot, None, None)
            pos_a, rot_a = pos[a], rot[a]

            if cd["one_way"]:
                c = -pen
                arm_p = _vsub(cpos, pos_a)
                cr1 = _vcross(arm_p, nrm)
                w1 = 1.0 / cd["mass_a"] + _vdot(cr1, _vmul(cr1, cd["inertia_a"]))
                dlambda = -c / (w1 + 1e-6)
                coll_mask = jnp.where(c < 0, 1.0, 0.0)
                pimp = _vscale(nrm, dlambda * coll_mask)
                dq_pos = _vscale(pimp, cs / cd["mass_a"])
                q_r = _vec_qmul(_vmul(_vcross(arm_p, pimp), cd["inertia_a"]), rot_a)
                dq_rot = tuple(cs * 0.5 * x for x in q_r)

                r1 = _rotate(_vsub(cpos, pos_a), _qinv(rot_a))
                p1bar = _vadd(prev_pos[a], _rotate(r1, prev_rot[a]))
                deltap = _vsub(cpos, p1bar)
                deltap_t = _vsub(deltap, _vscale(nrm, _vdot(deltap, nrm)))
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
                dq_rot = tuple(x + cs * 0.5 * y for x, y in zip(dq_rot, q_rt))
                add(a, dq_pos, dq_rot)
                per_contact.append(
                    dict(cd=cd, pos=cpos, normal=nrm, penetration=pen,
                         dlambda=dlambda * coll_mask)
                )
            else:
                pos_b, rot_b = pos[b], rot[b]
                pos_p = _vsub(cpos, _vscale(nrm, pen / 2.0))
                pos_c = _vadd(cpos, _vscale(nrm, pen / 2.0))
                arm_p = _vsub(pos_p, pos_a)
                arm_c = _vsub(pos_c, pos_b)
                c = -pen
                cr1 = _vcross(arm_p, nrm)
                w1 = 1.0 / cd["mass_a"] + _vdot(cr1, _vmul(cr1, cd["inertia_a"]))
                cr2 = _vcross(arm_c, nrm)
                w2 = 1.0 / cd["mass_b"] + _vdot(cr2, _vmul(cr2, cd["inertia_b"]))
                dlambda = -c / (w1 + w2 + 1e-6)
                coll_mask = jnp.where(c < 0, 1.0, 0.0)
                pimp = _vscale(nrm, dlambda * coll_mask)
                dq_p_pos = _vscale(pimp, cs / cd["mass_a"])
                q_pr = _vec_qmul(_vmul(_vcross(arm_p, pimp), cd["inertia_a"]), rot_a)
                dq_p_rot = tuple(cs * 0.5 * x for x in q_pr)
                dq_c_pos = _vscale(pimp, -cs / cd["mass_b"])
                q_cr = _vec_qmul(_vmul(_vcross(arm_c, pimp), cd["inertia_b"]), rot_b)
                dq_c_rot = tuple(-cs * 0.5 * x for x in q_cr)

                r1 = _rotate(_vsub(cpos, pos_a), _qinv(rot_a))
                r2 = _rotate(_vsub(cpos, pos_b), _qinv(rot_b))
                p1bar = _vadd(prev_pos[a], _rotate(r1, prev_rot[a]))
                p2bar = _vadd(prev_pos[b], _rotate(r2, prev_rot[b]))
                deltap = _vsub(_vsub(cpos, p1bar), _vsub(cpos, p2bar))
                deltap_t = _vsub(deltap, _vscale(nrm, _vdot(deltap, nrm)))
                arm_p2 = _vsub(cpos, pos_a)
                arm_c2 = _vsub(cpos, pos_b)
                ct = _vnorm_safe(deltap_t)
                nt = _vscale(deltap_t, 1.0 / (ct + 1e-6))
                cr1t = _vcross(arm_p2, nt)
                w1t = 1.0 / cd["mass_a"] + _vdot(cr1t, _vmul(cr1t, cd["inertia_a"]))
                cr2t = _vcross(arm_c2, nt)
                w2t = 1.0 / cd["mass_b"] + _vdot(cr2t, _vmul(cr2t, cd["inertia_b"]))
                dlambdat = -ct / (w1t + w2t)
                static_mask = jnp.where(jnp.abs(dlambdat) < jnp.abs(dlambda), 1.0, 0.0)
                pt = _vscale(nt, dlambdat * static_mask * coll_mask)
                dq_p_pos = _vadd(dq_p_pos, _vscale(pt, cs / cd["mass_a"]))
                q_prt = _vec_qmul(_vmul(_vcross(arm_p2, pt), cd["inertia_a"]), rot_a)
                dq_p_rot = tuple(x + cs * 0.5 * y for x, y in zip(dq_p_rot, q_prt))
                dq_c_pos = _vadd(dq_c_pos, _vscale(pt, -cs / cd["mass_b"]))
                npt = _vscale(pt, -1.0)
                q_crt = _vec_qmul(_vmul(_vcross(arm_c2, npt), cd["inertia_b"]), rot_b)
                dq_c_rot = tuple(x + cs * 0.5 * y for x, y in zip(dq_c_rot, q_crt))
                add(a, dq_p_pos, dq_p_rot)
                add(b, dq_c_pos, dq_c_rot)
                per_contact.append(
                    dict(cd=cd, pos=cpos, normal=nrm, penetration=pen,
                         dlambda=dlambda)
                )

        zero = jnp.zeros_like(pos[0][0])
        dpos = [(zero, zero, zero) for _ in range(nb)]
        drot = [(zero, zero, zero, zero) for _ in range(nb)]
        for (grp, bidx), acc in acc_pos.items():
            denom = 1e-6 + counts[(grp, bidx)]
            dpos[bidx] = _vadd(dpos[bidx], tuple(x / denom for x in acc))
            drot[bidx] = tuple(
                x + y / denom for x, y in zip(drot[bidx], acc_rot[(grp, bidx)])
            )
        return dpos, drot, per_contact

    def contact_velocity_pass(pos, rot, vel, ang, prev_pos, prev_vel, prev_ang, per_contact):
        """PBD velocity contacts (dynamic friction + restitution), 1/2-way."""
        acc_vel = {}
        acc_ang = {}
        counts = {}
        cur_grp = [None]

        def add(bidx, dv, da):
            key = (cur_grp[0], bidx)
            nz = jnp.where((dv[0] != 0) | (dv[1] != 0) | (dv[2] != 0), 1.0, 0.0)
            if key not in acc_vel:
                acc_vel[key], acc_ang[key], counts[key] = dv, da, nz
            else:
                acc_vel[key] = _vadd(acc_vel[key], dv)
                acc_ang[key] = _vadd(acc_ang[key], da)
                counts[key] = counts[key] + nz

        for pc in per_contact:
            cd = pc["cd"]
            cur_grp[0] = cd["grp"]
            a, b = cd["a"], cd["b"]
            cpos, nrm, pen, dlambda = pc["pos"], pc["normal"], pc["penetration"], pc["dlambda"]
            arm_a = _vsub(cpos, pos[a])
            if cd["one_way"]:
                rel_vel = _vadd(vel[a], _vcross(ang[a], arm_a))
            else:
                arm_b = _vsub(cpos, pos[b])
                rel_vel = _vsub(
                    _vadd(vel[a], _vcross(ang[a], arm_a)),
                    _vadd(vel[b], _vcross(ang[b], arm_b)),
                )
            v_n = _vdot(rel_vel, nrm)
            v_t = _vsub(rel_vel, _vscale(nrm, v_n))
            v_t_norm = _vnorm_safe(v_t)
            v_t_dir = _vscale(v_t, 1.0 / (1e-6 + v_t_norm))
            dvel_mag = -jnp.minimum(
                cd["friction"] * jnp.abs(dlambda) / (2.0 * h), v_t_norm
            )
            dvel = _vscale(v_t_dir, dvel_mag)
            if cd["one_way"]:
                angw = _vcross(arm_a, v_t_dir)
                w = 1.0 / cd["mass_a"] + _vdot(angw, angw)  # no inertia (ref parity)
                p_dyn = _vscale(dvel, 1.0 / (w + 1e-6))
            else:
                angw1 = _vcross(arm_a, v_t_dir)
                angw2 = _vcross(arm_b, v_t_dir)
                w1 = 1.0 / cd["mass_a"] + _vdot(angw1, _vmul(angw1, cd["inertia_a"]))
                w2 = 1.0 / cd["mass_b"] + _vdot(angw2, _vmul(angw2, cd["inertia_b"]))
                p_dyn = _vscale(dvel, 1.0 / (w1 + w2 + 1e-6))

            arm_a_old = _vsub(cpos, prev_pos[a])
            rel_vel_old = _vadd(prev_vel[a], _vcross(prev_ang[a], arm_a_old))
            if not cd["one_way"]:
                arm_b_old = _vsub(cpos, prev_pos[b])
                rel_vel_old = _vsub(
                    rel_vel_old, _vadd(prev_vel[b], _vcross(prev_ang[b], arm_b_old))
                )
            v_n_old = _vdot(rel_vel_old, nrm)

            rest_mag = -v_n - jnp.minimum(cd["elasticity"] * v_n_old, 0.0)
            dv_rest = _vscale(nrm, rest_mag)
            c = _vnorm_safe(dv_rest)
            nr = _vscale(dv_rest, 1.0 / (c + 1e-6))
            cr1 = _vcross(arm_a, nr)
            w1r = 1.0 / cd["mass_a"] + _vdot(cr1, _vmul(cr1, cd["inertia_a"]))
            if cd["one_way"]:
                dlambda_rest = c / (w1r + 1e-6)
                sinking = jnp.where(v_n_old <= -vel_threshold, 1.0, 0.0)
            else:
                arm_c_r = _vsub(_vadd(cpos, _vscale(nrm, pen)), pos[b])
                cr2 = _vcross(arm_c_r, nr)
                w2r = 1.0 / cd["mass_b"] + _vdot(cr2, _vmul(cr2, cd["inertia_b"]))
                dlambda_rest = c / (w1r + w2r + 1e-6)
                sinking = jnp.where(v_n_old <= 0.0, 1.0, 0.0)

            static_mask = jnp.where(pen > 0, 1.0, 0.0)
            pimp = tuple(
                (dlambda_rest * sinking * n_ + pd) * static_mask
                for n_, pd in zip(nr, p_dyn)
            )
            add(a, _vscale(pimp, 1.0 / cd["mass_a"]),
                _vcross(_vmul(arm_a, cd["inertia_a"]), pimp))
            if not cd["one_way"]:
                npimp = _vscale(pimp, -1.0)
                add(b, _vscale(npimp, 1.0 / cd["mass_b"]),
                    _vcross(_vmul(arm_b, cd["inertia_b"]), npimp))

        zero = jnp.zeros_like(pos[0][0])
        dvel_out = [(zero, zero, zero) for _ in range(nb)]
        dang_out = [(zero, zero, zero) for _ in range(nb)]
        for (grp, bidx), acc in acc_vel.items():
            denom = 1e-6 + counts[(grp, bidx)]
            dvel_out[bidx] = _vadd(dvel_out[bidx], tuple(x / denom for x in acc))
            dang_out[bidx] = _vadd(
                dang_out[bidx], tuple(x / denom for x in acc_ang[(grp, bidx)])
            )
        return dvel_out, dang_out

    # ----- integrator pieces -----

    def update_acc(vel, ang, dvel_list, dang_list):
        nvel, nang = [], []
        for b in range(nb):
            v = tuple(
                (vel_decay * vel[b][k] + (dvel_list[b][k] + gravity[k]) * dt)
                * f(pos_mask[b][k])
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
        dvel, dang = actuator_joint_damp_dp(pos, rot, vel, ang, act)
        vel, ang = update_acc(vel, ang, dvel, dang)
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

    def stack_rows(rows, width):
        return jnp.stack([jnp.stack(r[:width], axis=0) for r in rows], axis=0)

    def spring_substep(pos, rot, vel, ang, act, cva, caa):
        """One legacy-spring substep (system._spring_step parity)."""
        pos, rot = kinetic(pos, rot, vel, ang)
        dvel_j, dang_j = spring_joint_dp(pos, rot, vel, ang)
        dvel_a, dang_a = actuator_joint_damp_dp(
            pos, rot, vel, ang, act, joint_damp=False
        )
        dvel = [_vadd(a_, b_) for a_, b_ in zip(dvel_j, dvel_a)]
        dang = [_vadd(a_, b_) for a_, b_ in zip(dang_j, dang_a)]
        vel, ang = update_acc(vel, ang, dvel, dang)

        dvel_c, dang_c = contact_spring_pass(pos, rot, vel, ang)
        vel = [
            tuple((vel[b][k] + dvel_c[b][k]) * f(pos_mask[b][k]) for k in range(3))
            for b in range(nb)
        ]
        ang = [
            tuple((ang[b][k] + dang_c[b][k]) * f(rot_mask[b][k]) for k in range(3))
            for b in range(nb)
        ]
        cva = [_vadd(cva[b], dvel_c[b]) for b in range(nb)]
        caa = [_vadd(caa[b], dang_c[b]) for b in range(nb)]
        return pos, rot, vel, ang, cva, caa

    def _canon(state):
        """Nested tuples: fori_loop needs an exactly stable carry pytree,
        and the substep helpers mix lists and tuples freely."""
        return tuple(
            tuple(tuple(c for c in b) for b in comp) for comp in state
        )

    def tile_step(pos_arr, rot_arr, vel_arr, ang_arr, act_arr):
        pos = [body_vecs(pos_arr, b, 3) for b in range(nb)]
        rot = [body_vecs(rot_arr, b, 4) for b in range(nb)]
        vel = [body_vecs(vel_arr, b, 3) for b in range(nb)]
        ang = [body_vecs(ang_arr, b, 3) for b in range(nb)]
        act = tuple(act_arr[k] for k in range(act_arr.shape[0]))

        zero = jnp.zeros_like(pos[0][0])
        cva = [(zero, zero, zero) for _ in range(nb)]
        caa = [(zero, zero, zero) for _ in range(nb)]

        # Substep loops roll into a lax.fori_loop above _ROLL_MIN iterations:
        # a fully unrolled ant spring step took ~20 min of Mosaic compile
        # (one substep body traced `substeps` times); rolled, the body is
        # traced once.  Small counts stay unrolled for cross-substep fusion.
        def _roll(iters):
            if roll_substeps is None:
                return iters >= _ROLL_MIN
            return bool(roll_substeps)

        if sys.dynamics_mode == "legacy_spring":
            def spring_body(_, state):
                return _canon(spring_substep(*state[:4], act, *state[4:]))

            state = _canon((pos, rot, vel, ang, cva, caa))
            if _roll(sys.substeps):
                state = jax.lax.fori_loop(
                    0, sys.substeps, spring_body, state, unroll=False
                )
            else:
                for _ in range(sys.substeps):
                    state = spring_body(0, state)
            pos, rot, vel, ang, cva, caa = state
            return (
                stack_rows(pos, 3), stack_rows(rot, 4), stack_rows(vel, 3),
                stack_rows(ang, 3), stack_rows(cva, 3), stack_rows(caa, 3),
            )

        def pbd_body(_, state):
            s = half_substep(*state[:4], act, False, *state[4:])
            s = half_substep(*s[:4], act, True, *s[4:])
            return _canon(s)

        state = _canon((pos, rot, vel, ang, cva, caa))
        if _roll(n_substeps):
            state = jax.lax.fori_loop(
                0, n_substeps, pbd_body, state, unroll=False
            )
        else:
            for _ in range(n_substeps):
                state = pbd_body(0, state)
        pos, rot, vel, ang, cva, caa = state

        return (
            stack_rows(pos, 3), stack_rows(rot, 4), stack_rows(vel, 3),
            stack_rows(ang, 3), stack_rows(cva, 3), stack_rows(caa, 3),
        )

    return tile_step


def build_step_fn(
    sys: System, num_envs: int, tile: int = 512, sub: Optional[int] = None
):
    """Batched physics step: (QP[N], act[N, na]) -> (QP[N], Info).

    Uses the fused Pallas kernel when `supported(sys)` (TPU), else falls back
    to the vmapped jnp step.  Info carries the accumulated contact impulses
    (contact .vel/.ang), actuator/joint fields zero (no current env reads
    them), and empty contact-point debug arrays.

    `sub` overrides the sublane-tile height (default 8 = one (8, 128) vreg
    per op).  Wider tiles process several vregs per op, which can fill VPU
    dependency-stall slots in serial chains at the cost of VMEM working
    set — see tools/bench_v1_sub_sweep.py.
    """
    if not supported(sys) or jax.default_backend() not in ("tpu", "axon"):
        def fallback(qp, act):
            return jax.vmap(sys.step, in_axes=(0, 0))(qp, act)

        return fallback

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    del tile  # layout below fixes its own tiling
    nb = sys.num_bodies
    tile_step = _build_tile_step(sys)

    # Env axis as a 2D (sublane, lane) = (8, 128) square per 1024-env tile:
    # every logical scalar row becomes one full (8, 128) vreg.  The previous
    # rows-in-lanes layout put the 3/4-wide component axis in the sublane
    # dimension, wasting 5/8 of every vector op — this layout is 3.4x faster
    # (22.4M vs 6.5M env-steps/s on ant@4096) with bit-identical outputs.
    LANE = 128
    assert num_envs % LANE == 0
    n_rows = num_envs // LANE  # total sublane rows across the env axis
    # Mosaic blocks need sublane dim divisible by 8 or equal to the array's
    if sub is None:
        sub = 8 if n_rows % 8 == 0 else n_rows
    else:
        # mirror the default-selection rule: Mosaic needs the sublane tile
        # to be a multiple of 8 or span the whole dim; e.g. sub=4 with
        # n_rows=32 divides evenly but dies later with an opaque lowering
        # error
        assert n_rows % sub == 0, (n_rows, sub)
        assert sub % 8 == 0 or sub == n_rows, (n_rows, sub)

    def kernel(pos_ref, rot_ref, vel_ref, ang_ref, act_ref,
               opos_ref, orot_ref, ovel_ref, oang_ref, ocv_ref, oca_ref):
        outs = tile_step(pos_ref[:], rot_ref[:], vel_ref[:], ang_ref[:], act_ref[:])
        for ref, o in zip((opos_ref, orot_ref, ovel_ref, oang_ref, ocv_ref, oca_ref), outs):
            ref[:] = o

    def spec(rows, width):
        return pl.BlockSpec(
            (rows, width, sub, LANE),
            lambda i: (0, 0, i, 0),
            memory_space=pltpu.VMEM,
        )

    grid = (n_rows // sub,)

    @functools.lru_cache(maxsize=None)
    def make_call(na):
        # act width follows the env's action vector (it can exceed the
        # joint+force dof count when actions carry padded/unused dims)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[spec(nb, 3), spec(nb, 4), spec(nb, 3), spec(nb, 3),
                      pl.BlockSpec((na, sub, LANE), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[spec(nb, 3), spec(nb, 4), spec(nb, 3), spec(nb, 3),
                       spec(nb, 3), spec(nb, 3)],
            out_shape=[
                jax.ShapeDtypeStruct((nb, c, n_rows, LANE), jnp.float32)
                for c in (3, 4, 3, 3, 3, 3)
            ],
            # many-body composer scenes exceed Mosaic's default 16 MB scoped
            # VMEM (e.g. 4x-ant @16384 envs allocates 23 MB on the kernel
            # stack); see lowering.VMEM_LIMIT_BYTES for the chip assumption
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES
            ),
        )

    from brax_tpu.sim.types import DP

    def step(qp: QP, act):
        # (N, nb, C) -> (nb, C, N/128, 128) square-vreg layout
        t = lambda x: jnp.transpose(x, (1, 2, 0)).reshape(
            x.shape[1], x.shape[2], n_rows, LANE
        )
        call = make_call(act.shape[-1])
        act_t = act.T.reshape(act.shape[-1], n_rows, LANE)
        outs = call(t(qp.pos), t(qp.rot), t(qp.vel), t(qp.ang), act_t)
        u = lambda x: jnp.transpose(
            x.reshape(x.shape[0], x.shape[1], num_envs), (2, 0, 1)
        )
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

    Opt-in; the kernel matches the jnp path to float32 round-off.
    Differentiation works (custom VJP recomputes the backward through the
    jnp step), at the cost of one extra XLA forward when grads are taken.
    """
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def _with_vjp(sys: System, kernel_fn):
    """Makes the fused kernel differentiable: Pallas forward, XLA backward.

    The Mosaic kernel has no autodiff rule, so the backward pass re-derives
    gradients through the jnp reference step (jax.vjp of the vmapped
    _raw_step) — the two paths agree to float32 round-off, so gradients are
    consistent with the kernel's primal outputs.  Rollout forward speed keeps
    the kernel win; differentiating (APG) pays one extra XLA forward.
    """
    from brax_tpu.sim import system as system_mod

    @jax.custom_vjp
    def step(qp, act):
        return kernel_fn(qp, act)

    def fwd(qp, act):
        return kernel_fn(qp, act), (qp, act)

    def bwd(res, ct):
        qp, act = res
        _, vjp = jax.vjp(
            lambda q, a: jax.vmap(system_mod._raw_step, in_axes=(None, 0, 0))(
                sys, q, a
            ),
            qp,
            act,
        )
        return vjp(ct)

    step.defvjp(fwd, bwd)
    return step


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
                fn = _with_vjp(sys, fn)
                _STEP_CACHE[(key, axis_size)] = fn
            out = fn(qp, act)
            return out, out_batched
        out = jax.vmap(system_mod._raw_step, in_axes=(None, 0, 0))(sys, qp, act)
        return out, out_batched

    # hold a strong ref to sys so id() stays unique while cached
    _CUSTOM_CACHE[key] = (sys, custom_step)
    return custom_step
