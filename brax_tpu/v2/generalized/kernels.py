"""Fused Pallas TPU kernel for the generalized-coordinate pipeline.

Why: one generalized pipeline step of ant lowers to hundreds of tiny XLA ops
(14-dof mass matrix, 24-row constraint solve, per-link spatial algebra), each
touching a (batch, ~14, ~14) array for well under a microsecond — at useful
env batches the program is launch-latency bound, roughly 10k env-steps/s at
batch 512 where the v1 fused kernel does 24M (see VERDICT.md round 1, item 1,
and the reference's own profile note at
/root/reference/brax/v2/generalized/constraint.py:206-217).

This module compiles the ENTIRE env-step physics — all `n_frames` pipeline
steps: forward kinematics (free/1/2/3-dof joints), sphere/capsule-plane
narrowphase, CoM-frame spatial inertia/dof transforms, RNE bias forces,
CRB mass matrix, warm-started Newton-Schulz inverse, constraint jacobian,
FISTA NNLS contact solve, semi-implicit integration — into ONE Pallas
kernel per environment tile.  Covers the whole v2 env family (ant,
halfcheetah, humanoid, inverted_pendulum).

Design (see /opt/skills/guides/pallas_guide.md and brax_tpu/sim/kernels.py,
whose square-vreg layout this reuses):
- the env batch axis is a trailing (sublane, lane) = (8, 128) square: every
  per-env scalar is one full (8, 128) vreg; links/dofs/constraint rows are
  small leading axes unrolled at trace time;
- small per-env matrices (mass matrix (14,14), constraint system (24,24))
  are jnp arrays with trailing env dims; mat-vec/mat-mat contractions reduce
  over leading axes, so every vector op runs at full VPU width;
- all static scene parameters (inertias, joint frames/axes, limits, gears,
  contact radii/normals, structure masks) bake into the kernel as literals
  computed from the System at build time — zero gathers, zero captured
  operands.

The jnp pipeline (brax_tpu/v2/generalized/pipeline.py) remains the source of
truth: it serves autodiff, CPU, and systems `supported()` does not cover.
Numerics match it to float32 round-off; the one semantic difference is that
the mass-matrix inverse refresh runs lazily (at the START of the next frame,
warm-started from the previous inverse) so a kernel env-step carries only
(q, qd, mass_mx_inv).  State cache fields other than
q/qd/x/xd/contact/mass_mx_inv are NOT refreshed by the kernel path (no env,
wrapper, or trainer reads them between steps).

Reference parity anchors: brax/v2/generalized/{pipeline,dynamics,mass,
constraint,integrator}.py, brax/v2/kinematics.py:27-103,
brax/v2/geometry/contact.py:56-63 (sphere-plane).
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.sim.lowering import VMEM_LIMIT_BYTES
from brax_tpu.v2 import masks
from brax_tpu.v2.base import Capsule, Plane, Sphere, System, Transform
from brax_tpu.v2.generalized.base import State
from brax_tpu.v2.generalized.mass import NS_ITERS

Array = jax.Array

# ---------------------------------------------------------------------------
# small algebra on (component..., S, L) stacks: the leading axes are logical
# vector/matrix dims, the trailing two are the env tile
# ---------------------------------------------------------------------------


def _vdot(a, b):
    return jnp.sum(a * b, axis=0)


def _cross(a, b):
    return jnp.stack(
        [
            a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0],
        ]
    )


def _rotate(v, q):
    """maths.rotate on (3,S,L) by (4,S,L): 2(u.v)u + (s^2 - u.u)v + 2s(u x v)."""
    s, u = q[0], q[1:4]
    uv = _vdot(u, v)
    uu = _vdot(u, u)
    return 2 * (uv * u) + (s * s - uu) * v + 2 * s * _cross(u, v)


def _qmul(u, v):
    return jnp.stack(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ]
    )


def _qinv(q):
    return jnp.stack([q[0], -q[1], -q[2], -q[3]])


def _safe_norm(x):
    """maths.safe_norm over the leading component axis."""
    is_zero = jnp.all(jnp.abs(x) <= 1e-8, axis=0)
    xsafe = jnp.where(is_zero[None], jnp.ones_like(x), x)
    n = jnp.sqrt(jnp.sum(xsafe * xsafe, axis=0))
    return jnp.where(is_zero, 0.0, n)


def _normalize_with_norm(x):
    """maths.normalize_with_norm: unit inputs pass through bit-exact."""
    n = _safe_norm(x)
    return x / (n + 1e-6 * (n == 0.0))[None], n


def _quat_rot_axis(axis, angle):
    """(3,S,L) or (3,1,1) axis, (S,L) angle -> (4,S,L)."""
    s = jnp.sin(angle / 2)
    w = jnp.cos(angle / 2)
    ax = axis * jnp.ones_like(angle)[None]
    return jnp.concatenate([w[None], ax * s[None]], axis=0)


def _q33(q):
    """maths.quat_to_3x3 -> (3,3,S,L)."""
    d = _vdot(q, q)
    w, x, y, z = q[0], q[1], q[2], q[3]
    s = 2.0 / d
    xs, ys, zs = x * s, y * s, z * s
    wx, wy, wz = w * xs, w * ys, w * zs
    xx, xy, xz = x * xs, x * ys, x * zs
    yy, yz, zz = y * ys, y * zs, z * zs
    return jnp.stack(
        [
            jnp.stack([1 - (yy + zz), xy - wz, xz + wy]),
            jnp.stack([xy + wz, 1 - (xx + zz), yz - wx]),
            jnp.stack([xz - wy, yz + wx, 1 - (xx + yy)]),
        ]
    )


def _mv(a, x):
    """(m,n,S,L) @ (n,S,L) -> (m,S,L)."""
    return jnp.sum(a * x[None], axis=1)


def _mtv(a, x):
    """(n,m,S,L)^T @ (n,S,L) -> (m,S,L)."""
    return jnp.sum(a * x[:, None], axis=0)


def _mm(a, b):
    """(m,k,S,L) @ (k,n,S,L) -> (m,n,S,L), row-chunked to bound temporaries."""
    return jnp.stack([jnp.sum(a[i][:, None] * b, axis=0) for i in range(a.shape[0])])


def _mm_sym(a, b):
    """a @ b for a product known symmetric (e.g. X M X with X, M symmetric):
    computes the upper triangle only and mirrors it.  The mirrored lower
    half differs from a direct evaluation at float round-off only."""
    m = a.shape[0]
    arow = [a[i] for i in range(m)]  # hoisted: one slice per row/column,
    bcol = [b[:, j] for j in range(m)]  # not one per (i, j) cell
    cell = [[None] * m for _ in range(m)]
    for i in range(m):
        for j in range(i, m):
            v = jnp.sum(arow[i] * bcol[j], axis=0)
            cell[i][j] = v
            if i != j:
                cell[j][i] = v
    return jnp.stack([jnp.stack(r) for r in cell])


def _np_rotate(v: onp.ndarray, q: onp.ndarray) -> onp.ndarray:
    """Static quaternion rotation in float64 numpy (build-time)."""
    v = onp.asarray(v, onp.float64)
    w, x, y, z = onp.asarray(q, onp.float64)
    u = onp.array([x, y, z])
    return onp.asarray(
        v * (w * w - u @ u) + 2.0 * u * (u @ v) + 2.0 * w * onp.cross(u, v),
        onp.float32,
    )


def _np_qmul(u: onp.ndarray, v: onp.ndarray) -> onp.ndarray:
    u = onp.asarray(u, onp.float64)
    v = onp.asarray(v, onp.float64)
    return onp.asarray(
        [
            u[0] * v[0] - u[1] * v[1] - u[2] * v[2] - u[3] * v[3],
            u[0] * v[1] + u[1] * v[0] + u[2] * v[3] - u[3] * v[2],
            u[0] * v[2] - u[1] * v[3] + u[2] * v[0] + u[3] * v[1],
            u[0] * v[3] + u[1] * v[2] - u[2] * v[1] + u[3] * v[0],
        ],
        onp.float32,
    )


# ---------------------------------------------------------------------------
# static scene extraction
# ---------------------------------------------------------------------------


class _Plan:
    """All static structure/parameters for one System, as numpy.

    `tile` is the (sublane, lane) shape of the env tile this plan's kernel
    is traced for; `cvec`/`c3`/`c4` splat static constants to it.
    """

    def __init__(self, sys: System, tile: Tuple[int, int] = (1, 1)):
        # snapshot every leaf to numpy up front: the plan is also built
        # INSIDE jit traces (custom-vmap dispatch), where any jnp op on the
        # closed-over System's concrete leaves — even a slice — would stage
        # a tracer and break the int()/float() literal extraction below
        sys = jax.tree_util.tree_map(onp.asarray, sys)
        self.tile = tile
        self.nl = sys.num_links()
        self.nq = sys.q_size()
        self.nd = sys.qd_size()
        self.link_types = sys.link_types
        self.parents = tuple(sys.link_parents)
        self.dt = float(sys.dt)
        self.gravity = onp.asarray(sys.gravity, onp.float32)
        self.solver_iters = int(sys.solver_iterations)

        # per-link q/qd offsets (q/qd layout is link-major; base.py q_idx)
        qo, do = 0, 0
        self.q_off, self.qd_off, self.q_width, self.qd_width = [], [], [], []
        widths = {"f": (7, 6), "1": (1, 1), "2": (2, 2), "3": (3, 3)}
        for t in sys.link_types:
            qw, dw = widths[t]
            self.q_off.append(qo)
            self.qd_off.append(do)
            self.q_width.append(qw)
            self.qd_width.append(dw)
            qo += qw
            do += dw

        # pure-Python dof->link map (sys.dof_link() builds a jnp array,
        # which would be a tracer when the plan is built inside a jit trace
        # — the custom-vmap dispatch path does exactly that)
        self.dof_link = [
            i
            for i, t in enumerate(sys.link_types)
            for _ in range(widths[t][1])
        ]
        # transform_com parent anchor: free links anchor to themselves
        self.com_parent = [
            i if t == "f" else p
            for i, (t, p) in enumerate(zip(sys.link_types, self.parents))
        ]

        L = sys.link
        self.t_pos = onp.asarray(L.transform.pos, onp.float32)
        self.t_rot = onp.asarray(L.transform.rot, onp.float32)
        self.j_pos = onp.asarray(L.joint.pos, onp.float32)
        self.j_rot = onp.asarray(L.joint.rot, onp.float32)
        self.it_pos = onp.asarray(L.inertia.transform.pos, onp.float32)
        self.it_rot = onp.asarray(L.inertia.transform.rot, onp.float32)
        self.inertia_i = onp.asarray(L.inertia.i, onp.float32)
        self.mass = onp.asarray(L.inertia.mass, onp.float32)
        self.link_invweight = onp.asarray(L.invweight, onp.float32)

        D = sys.dof
        self.motion_ang = onp.asarray(D.motion.ang, onp.float32)
        self.motion_vel = onp.asarray(D.motion.vel, onp.float32)
        self.armature = onp.asarray(D.armature, onp.float32)
        self.damping = onp.asarray(D.damping, onp.float32)
        self.stiffness = onp.asarray(D.stiffness, onp.float32)
        self.dof_invweight = onp.asarray(D.invweight, onp.float32)
        self.limit = (
            None
            if D.limit is None
            else (
                onp.asarray(D.limit[0], onp.float32),
                onp.asarray(D.limit[1], onp.float32),
            )
        )

        self.anc_link = onp.asarray(masks.ancestor_links(sys), onp.float32)
        self.sub_link = onp.asarray(masks.subtree_links(sys), onp.float32)
        self.dof_anc = onp.asarray(masks.ancestor_dofs(sys), onp.float32)
        self.dof_pair = onp.asarray(masks.dof_pairs(sys), onp.float32)

        # actuators ('m' motors only; see supported())
        A = sys.actuator
        self.act_gear = onp.asarray(A.gear, onp.float32) if A else onp.zeros(0)
        self.act_lo = (
            onp.asarray(A.ctrl_range[:, 0], onp.float32) if A else onp.zeros(0)
        )
        self.act_hi = (
            onp.asarray(A.ctrl_range[:, 1], onp.float32) if A else onp.zeros(0)
        )
        self.act_qdid = [int(i) for i in (sys.actuator_qdid or ())]

        # sphere/capsule vs world-static-plane contacts (see supported()).
        # Ordering must match geometry.contact: _capsule_plane is vmapped
        # per capsule then flattened by the concatenates at
        # contact.py:256-268, so rows interleave per capsule (+end, -end).
        self.c_link: List[int] = []
        self.c_lpos: List[onp.ndarray] = []
        self.c_radius: List[float] = []
        self.c_friction: List[float] = []
        self.c_elasticity: List[float] = []
        self.c_normal: List[onp.ndarray] = []
        self.c_ppos: List[onp.ndarray] = []
        for ga, gb in sys.contacts or ():
            s_pos = onp.asarray(ga.transform.pos, onp.float32)
            s_rot = onp.asarray(ga.transform.rot, onp.float32)
            s_rad = onp.asarray(ga.radius, onp.float32)
            s_fric = onp.asarray(ga.friction, onp.float32)
            s_elast = onp.asarray(ga.elasticity, onp.float32)
            p_pos = onp.asarray(gb.transform.pos, onp.float32)
            p_rot = onp.asarray(gb.transform.rot, onp.float32)
            p_fric = onp.asarray(gb.friction, onp.float32)
            p_elast = onp.asarray(gb.elasticity, onp.float32)
            if isinstance(ga, Sphere):
                offs: List[Optional[float]] = [None]  # single center point
            else:  # Capsule: one end-sphere per manifold row
                length = onp.asarray(ga.length, onp.float32)
                offs = [0.5, -0.5]
            for k in range(s_pos.shape[0]):
                for sign in offs:
                    lpos = s_pos[k]
                    if sign is not None:
                        seg = _np_rotate(
                            onp.array([0.0, 0.0, float(length[k])]), s_rot[k]
                        )
                        lpos = lpos + onp.float32(sign) * seg
                    self.c_link.append(int(ga.link_idx[k]))
                    self.c_lpos.append(onp.asarray(lpos, onp.float32))
                    self.c_radius.append(float(s_rad[k]))
                    self.c_friction.append(float(max(s_fric[k], p_fric[k])))
                    self.c_elasticity.append(
                        float(max(s_elast[k], p_elast[k]))
                    )
                    # plane normal/pos are static: rotate +z by the plane quat
                    w, x, y, z = p_rot[k]
                    n = onp.array(
                        [
                            2 * (x * z + w * y),
                            2 * (y * z - w * x),
                            w * w - x * x - y * y + z * z,
                        ],
                        onp.float32,
                    )
                    self.c_normal.append(n)
                    self.c_ppos.append(p_pos[k])
        self.nc = len(self.c_link)

        # limit rows follow the reference's q_idx('123') order
        self.lim_dofs = [
            d
            for l, t in enumerate(sys.link_types)
            if t in "123"
            for d in range(self.qd_off[l], self.qd_off[l] + self.qd_width[l])
        ]
        self.lim_qs = [
            qi
            for l, t in enumerate(sys.link_types)
            if t in "123"
            for qi in range(self.q_off[l], self.q_off[l] + self.q_width[l])
        ]
        self.nr = 4 * self.nc + (len(self.lim_dofs) if self.limit is not None else 0)

    def cvec(self, v) -> Array:
        """Static vector -> (n, S, L) full-tile constant, built from scalar
        literals: Pallas kernels reject captured array constants (jaxpr
        consts), but scalar splats embed in the ops themselves.
        Materializing the full tile keeps every constant in replicated
        layout — Mosaic cannot relayout a rank>2 (n,1,1) vector into a
        broadcast (n,S,L) operand (vector.broadcast vpad{0,0} -> vpad{*,*}
        fails to compile)."""
        v = onp.asarray(v, onp.float32).reshape(-1)
        s, l = self.tile
        return jnp.stack([jnp.full((s, l), float(x), jnp.float32) for x in v])

    # static 3-vector / quaternion constants: same full-tile splat
    c3 = cvec
    c4 = cvec


def supported(sys: System) -> bool:
    """True when this System lowers to the fused kernel.

    Covers: free/1/2/3-dof link trees (hinges, slides, and their stacked
    compositions — ant, halfcheetah, humanoid, inverted_pendulum), motor
    actuators, sphere/capsule vs world-static-plane contacts.
    """
    try:
        if not all(t in "f123" for t in sys.link_types):
            return False
        if sys.actuator_types and set(sys.actuator_types) != {"m"}:
            return False
        for ga, gb in sys.contacts or ():
            if not (
                isinstance(ga, (Sphere, Capsule)) and isinstance(gb, Plane)
            ):
                return False
            if gb.link_idx is not None:
                return False
        # static leaves must be concrete (no tracers: params bake into code)
        for leaf in jax.tree_util.tree_leaves(sys):
            if isinstance(leaf, jax.core.Tracer):
                return False
        return True
    except Exception:  # noqa: BLE001 pragma: no cover
        return False


# ---------------------------------------------------------------------------
# the fused frame: one generalized pipeline step on a (S, L) env tile
# ---------------------------------------------------------------------------


def _fk(p: _Plan, q):
    """Forward kinematics positions/rotations (kinematics.forward:57-86).

    Returns per-link world (pos (3,S,L), rot (4,S,L)) plus the joint-local
    transforms/motions needed by velocity FK.
    """
    j_pos: List[Any] = [None] * p.nl
    j_rot: List[Any] = [None] * p.nl
    for l, t in enumerate(p.link_types):
        qo = p.q_off[l]
        if t == "f":
            j_pos[l] = q[qo : qo + 3]
            j_rot[l] = q[qo + 3 : qo + 7]
        else:
            # compose per-dof transforms j = j0.do(j1)... (kinematics.py
            # _joint_transform_motion's jcalc loop); 1-dof reduces to the
            # single axis rotation/translation
            jp = jr = None
            do = p.qd_off[l]
            for i in range(p.qd_width[l]):
                qi = q[qo + i]
                axis = p.c3(p.motion_ang[do + i])
                rot_i, _ = _normalize_with_norm(_quat_rot_axis(axis, qi))
                pos_i = p.c3(p.motion_vel[do + i]) * qi[None]
                if jp is None:
                    jp, jr = pos_i, rot_i
                else:
                    jp = jp + _rotate(pos_i, jr)
                    jr = _qmul(jr, rot_i)
            j_pos[l], j_rot[l] = jp, jr
        # anchor offset then parent-frame placement (kinematics.py:69-71)
        anchor = _rotate(p.c3(p.j_pos[l]), j_rot[l])
        j_pos[l] = j_pos[l] + p.c3(p.j_pos[l]) - anchor
        j_pos[l] = p.c3(p.t_pos[l]) + _rotate(j_pos[l], p.c4(p.t_rot[l]))
        j_rot[l] = _qmul(p.c4(p.t_rot[l]), j_rot[l])

    x_pos: List[Any] = [None] * p.nl
    x_rot: List[Any] = [None] * p.nl
    for l in range(p.nl):
        par = p.parents[l]
        if par == -1:
            x_pos[l], x_rot[l] = j_pos[l], j_rot[l]
        else:
            x_pos[l] = x_pos[par] + _rotate(j_pos[l], x_rot[par])
            x_rot[l] = _qmul(x_rot[par], j_rot[l])
    x_rot = [_normalize_with_norm(r)[0] for r in x_rot]
    return x_pos, x_rot


def _fk_vel(p: _Plan, q, qd, x_pos, x_rot):
    """Velocity part of FK (kinematics.forward's xd), for State.xd output."""
    jd_ang: List[Any] = [None] * p.nl
    jd_vel: List[Any] = [None] * p.nl
    for l, t in enumerate(p.link_types):
        do = p.qd_off[l]
        qo = p.q_off[l]
        if t == "f":
            jd_ang[l] = qd[do + 3 : do + 6]
            jd_vel[l] = qd[do : do + 3]
        else:
            # accumulate per-dof motions through each dof's own transform
            # (kinematics.py _joint_transform_motion's jd loop)
            ja = p.c3(p.motion_ang[do]) * qd[do][None]
            jv = p.c3(p.motion_vel[do]) * qd[do][None]
            for i in range(1, p.qd_width[l]):
                d = do + i
                qi = q[qo + i]
                axis = p.c3(p.motion_ang[d])
                rot_i, _ = _normalize_with_norm(_quat_rot_axis(axis, qi))
                pos_i = p.c3(p.motion_vel[d]) * qi[None]
                jdi_ang = p.c3(p.motion_ang[d]) * qd[d][None]
                jdi_vel = p.c3(p.motion_vel[d]) * qd[d][None]
                ja = ja + _rotate(jdi_ang, rot_i)
                jv = jv + _rotate(jdi_vel + _cross(pos_i, jdi_ang), rot_i)
            jd_ang[l], jd_vel[l] = ja, jv

    xd_ang: List[Any] = [None] * p.nl
    xd_vel: List[Any] = [None] * p.nl
    for l in range(p.nl):
        par = p.parents[l]
        if par == -1:
            xd_ang[l], xd_vel[l] = jd_ang[l], jd_vel[l]
        else:
            xd_ang[l] = xd_ang[par] + _rotate(jd_ang[l], x_rot[l])
            xd_vel[l] = xd_vel[par] + _rotate(
                jd_vel[l] + _cross(x_pos[l], jd_ang[l]), x_rot[l]
            )
    return xd_ang, xd_vel


def _contacts(p: _Plan, x_pos, x_rot):
    """Sphere vs world-plane narrowphase (geometry/contact.py:51-57).

    Returns (pos (3,S,L), penetration (S,L)) per contact point.
    """
    cpos, cpen = [], []
    for c in range(p.nc):
        l = p.c_link[c]
        n = p.c3(p.c_normal[c])
        spos = x_pos[l] + _rotate(p.c3(p.c_lpos[c]), x_rot[l])
        t = _vdot(spos - p.c3(p.c_ppos[c]), n)
        pen = p.c_radius[c] - t
        pos = spos - n * (p.c_radius[c] - 0.5 * pen)[None]
        cpos.append(pos)
        cpen.append(pen)
    return cpos, cpen


def _transform_com(p: _Plan, q, qd, x_pos, x_rot):
    """CoM-frame terms (dynamics.transform_com, dynamics.py:22-121).

    Returns com, cinr (list of (i, hpos, mass)), cd, cdof, cdofd where
    cd/cdof/cdofd carry (ang, vel) stacks.
    """
    # xi = x.do(link.inertia.transform); com = mass-weighted mean
    xi_pos, xi_rot = [], []
    for l in range(p.nl):
        xi_pos.append(
            x_pos[l] + _rotate(p.c3(p.it_pos[l]), x_rot[l])
        )
        xi_rot.append(_qmul(x_rot[l], p.c4(p.it_rot[l])))
    tot = float(p.mass.sum())
    com = sum(float(p.mass[l]) * xi_pos[l] for l in range(p.nl)) / tot

    # cinr[l] = Transform(pos=xi.pos-com, rot=xi.rot).do(inertia[l])
    cinr_i, cinr_h = [], []
    for l in range(p.nl):
        pos = xi_pos[l] - com
        r = _q33(xi_rot[l])
        i0 = p.inertia_i[l]
        # r @ i0 @ r^T with i0 static  (base.py:108-118)
        ri = jnp.stack(
            [
                jnp.stack(
                    [sum(r[a][k] * float(i0[k, b]) for k in range(3)) for b in range(3)]
                )
                for a in range(3)
            ]
        )
        rirt = jnp.stack(
            [
                jnp.stack([_vdot(ri[a], r[b]) for b in range(3)])
                for a in range(3)
            ]
        )
        # h h^T m, h[k,:] = cross(pos, -e_k)
        e = onp.eye(3, dtype=onp.float32)
        h = jnp.stack([_cross(pos, p.c3(-e[k])) for k in range(3)])
        hht = jnp.stack(
            [
                jnp.stack([_vdot(h[a], h[b]) for b in range(3)])
                for a in range(3)
            ]
        )
        cinr_i.append(rirt + hht * float(p.mass[l]))
        cinr_h.append(pos * float(p.mass[l]))

    # joint frames: j = x[com_parent].do(link.transform).do(link.joint);
    # root links without a free joint anchor to the world identity frame
    # (the jnp path's Transform.zero pad at take(-1))
    jf_pos, jf_rot = [], []
    for l in range(p.nl):
        par = p.com_parent[l]
        if par == -1:
            a_np = p.t_pos[l] + _np_rotate(p.j_pos[l], p.t_rot[l])
            r_np = _np_qmul(p.t_rot[l], p.j_rot[l])
            jf_pos.append(p.c3(a_np))
            jf_rot.append(p.c4(r_np))
            continue
        a_pos = x_pos[par] + _rotate(p.c3(p.t_pos[l]), x_rot[par])
        a_rot = _qmul(x_rot[par], p.c4(p.t_rot[l]))
        jf_pos.append(a_pos + _rotate(p.c3(p.j_pos[l]), a_rot))
        jf_rot.append(_qmul(a_rot, p.c4(p.j_rot[l])))

    # cdof rows (dynamics.py:43-73): each dof's motion seen through the
    # preceding dofs' joint transforms (the jnp cdof_fn acc chain), then
    # ang rotated into the world joint frame and vel offset to the CoM
    cdof_ang: List[Any] = [None] * p.nd
    cdof_vel: List[Any] = [None] * p.nd
    for l, t in enumerate(p.link_types):
        do, qo = p.qd_off[l], p.q_off[l]
        if t == "f":
            for i in range(6):
                d = do + i
                ang = _rotate(p.c3(p.motion_ang[d]), jf_rot[l])
                vel = p.c3(p.motion_vel[d]) - _cross(com - jf_pos[l], ang)
                cdof_ang[d], cdof_vel[d] = ang, vel
            continue
        acc_pos = acc_rot = None  # identity accumulated transform
        for i in range(p.qd_width[l]):
            d = do + i
            m_ang = p.c3(p.motion_ang[d])
            m_vel = p.c3(p.motion_vel[d])
            if acc_rot is None:
                ang_loc, vel_loc = m_ang, m_vel
            else:
                ang_loc = _rotate(m_ang, acc_rot)
                vel_loc = _rotate(m_vel + _cross(acc_pos, m_ang), acc_rot)
            ang = _rotate(ang_loc, jf_rot[l])
            vel = vel_loc - _cross(com - jf_pos[l], ang)
            cdof_ang[d], cdof_vel[d] = ang, vel
            if i + 1 < p.qd_width[l]:
                qi = q[qo + i]
                rot_i, _ = _normalize_with_norm(
                    _quat_rot_axis(p.c3(p.motion_ang[d]), qi)
                )
                pos_i = p.c3(p.motion_vel[d]) * qi[None]
                if acc_rot is None:
                    acc_pos, acc_rot = pos_i, rot_i
                else:
                    acc_pos = acc_pos + _rotate(pos_i, acc_rot)
                    acc_rot = _qmul(acc_rot, rot_i)

    cdof_qd_ang = [cdof_ang[d] * qd[d][None] for d in range(p.nd)]
    cdof_qd_vel = [cdof_vel[d] * qd[d][None] for d in range(p.nd)]

    # cd[l] = sum of ancestor-dof cdof*qd (dynamics.py:75-79)
    cd_ang, cd_vel = [], []
    for l in range(p.nl):
        dd = [d for d in range(p.nd) if p.dof_anc[l, d] > 0]
        cd_ang.append(sum(cdof_qd_ang[d] for d in dd))
        cd_vel.append(sum(cdof_qd_vel[d] for d in dd))

    # cdofd (dynamics.py:81-119)
    cdofd_ang: List[Any] = [None] * p.nd
    cdofd_vel: List[Any] = [None] * p.nd
    for l, t in enumerate(p.link_types):
        do = p.qd_off[l]
        if t == "f":
            # velocity-product from the link's own linear motion rows
            lin_ang = sum(cdof_qd_ang[do + k] for k in range(3))
            lin_vel = sum(cdof_qd_vel[do + k] for k in range(3))
            for k in range(6):
                d = do + k
                if k < 3:
                    z = jnp.zeros_like(cdof_ang[d])
                    cdofd_ang[d], cdofd_vel[d] = z, z
                else:
                    cdofd_ang[d] = _cross(lin_ang, cdof_ang[d])
                    cdofd_vel[d] = _cross(lin_ang, cdof_vel[d]) + _cross(
                        lin_vel, cdof_ang[d]
                    )
        else:
            # cds[i] = parent cd + preceding same-link cdof*qd rows
            # (dynamics.py cdofd_fn); roots see the zero pad, not link -1
            par = p.com_parent[l]
            if par == -1:
                pa = pv = jnp.zeros_like(cdof_ang[do])
            else:
                pa, pv = cd_ang[par], cd_vel[par]
            for i in range(p.qd_width[l]):
                d = do + i
                cdofd_ang[d] = _cross(pa, cdof_ang[d])
                cdofd_vel[d] = _cross(pa, cdof_vel[d]) + _cross(pv, cdof_ang[d])
                if i + 1 < p.qd_width[l]:
                    pa = pa + cdof_qd_ang[d]
                    pv = pv + cdof_qd_vel[d]

    return com, (cinr_i, cinr_h), (cd_ang, cd_vel), (cdof_ang, cdof_vel), (
        cdofd_ang,
        cdofd_vel,
    )


def _inertia_mul(i_mx, h, mass, m_ang, m_vel):
    """Inertia.mul (base.py:203-209): force (ang, vel)."""
    ang = _mv(i_mx, m_ang) + _cross(h, m_vel)
    vel = mass * m_vel - _cross(h, m_ang)
    return ang, vel


def _bias(p: _Plan, qd, cinr, cd, cdof, cdofd):
    """RNE bias force (dynamics.inverse, dynamics.py:124-145)."""
    cinr_i, cinr_h = cinr
    cd_ang, cd_vel = cd
    cdof_ang, cdof_vel = cdof
    cdofd_ang, cdofd_vel = cdofd

    grav = p.c3(p.gravity)
    cfrc_ang, cfrc_vel = [], []
    for l in range(p.nl):
        dd = [d for d in range(p.nd) if p.dof_anc[l, d] > 0]
        cdd_ang = sum(cdofd_ang[d] * qd[d][None] for d in dd)
        cdd_vel = sum(cdofd_vel[d] * qd[d][None] for d in dd) - grav
        fa, fv = _inertia_mul(cinr_i[l], cinr_h[l], float(p.mass[l]), cdd_ang, cdd_vel)
        ia, iv = _inertia_mul(
            cinr_i[l], cinr_h[l], float(p.mass[l]), cd_ang[l], cd_vel[l]
        )
        # Motion.cross(Force) (base.py:156-162)
        fa = fa + _cross(cd_ang[l], ia) + _cross(cd_vel[l], iv)
        fv = fv + _cross(cd_ang[l], iv)
        cfrc_ang.append(fa)
        cfrc_vel.append(fv)

    bias = []
    for d in range(p.nd):
        ll = [k for k in range(p.nl) if p.sub_link[p.dof_link[d], k] > 0]
        sa = sum(cfrc_ang[k] for k in ll)
        sv = sum(cfrc_vel[k] for k in ll)
        bias.append(_vdot(cdof_vel[d], sv) + _vdot(cdof_ang[d], sa))
    return bias


def _mass_matrix(p: _Plan, cinr, cdof):
    """CRB mass matrix (mass.matrix, mass.py:20-41) -> (nd, nd, S, L)."""
    cinr_i, cinr_h = cinr
    cdof_ang, cdof_vel = cdof

    # composite (subtree) inertias
    crb_i, crb_h, crb_m = [], [], []
    for l in range(p.nl):
        ll = [k for k in range(p.nl) if p.sub_link[l, k] > 0]
        crb_i.append(sum(cinr_i[k] for k in ll))
        crb_h.append(sum(cinr_h[k] for k in ll))
        crb_m.append(float(sum(p.mass[k] for k in ll)))

    f_ang, f_vel = [], []
    for d in range(p.nd):
        l = p.dof_link[d]
        fa, fv = _inertia_mul(crb_i[l], crb_h[l], crb_m[l], cdof_ang[d], cdof_vel[d])
        f_ang.append(fa)
        f_vel.append(fv)

    zero = jnp.zeros_like(f_ang[0][0])
    rows = []
    for i in range(p.nd):
        row = []
        for j in range(p.nd):
            # tril + mirrored upper, masked by ancestor-pair structure
            ii, jj = (i, j) if j <= i else (j, i)
            if p.dof_pair[ii, jj] > 0:
                v = _vdot(f_ang[ii], cdof_ang[jj]) + _vdot(f_vel[ii], cdof_vel[jj])
            else:
                v = zero
            if i == j:
                v = v + float(p.armature[i])
            row.append(v)
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _inv_ns(mx, minv0, iters=NS_ITERS, tol=1e-12):
    """maths.inv_approximate on (nd,nd,S,L): warm-started Newton-Schulz.

    Mosaic-safe: no (nd,nd)->(nd,nd,1,1) identity reshape (unsupported
    shape cast — tiled dims would move) and no leading-dim transpose.
    The CRB matrix is symmetric by construction (_mass_matrix mirrors the
    upper triangle), so M^T == M; ||I - P||_F^2 expands to
    sum(P*P) - 2 tr(P) + nd without materializing I.
    """
    nd = mx.shape[0]
    mt = mx  # symmetric by construction

    p0 = _mm(mx, minv0)
    tr_p0 = functools.reduce(jnp.add, [p0[i, i] for i in range(nd)])
    r0n = jnp.sqrt(
        jnp.maximum(jnp.sum(p0 * p0, axis=(0, 1)) - 2.0 * tr_p0 + float(nd), 0.0)
    )
    tr = jnp.sum(mx * mx, axis=(0, 1))  # trace(a @ a.T)
    fallback = 0.5 * mt / tr[None, None]
    cur = jnp.where(r0n[None, None] > 1.0, fallback, minv0)

    err = jnp.ones_like(r0n)
    for _ in range(iters):
        # X M X is symmetric for symmetric X, M: mirror its upper triangle
        nxt = 2 * cur - _mm_sym(cur, _mm(mt, cur))
        nxt_err = jnp.sqrt(jnp.sum((nxt - cur) ** 2, axis=(0, 1)))
        cur = jnp.where((err > tol)[None, None], nxt, cur)
        err = jnp.where(err > tol, nxt_err, err)
    return cur


def _imp_aref(pos, vel):
    """Constraint impedance (constraint.py:45-66), elementwise on (r,S,L)."""
    timeconst, dampratio = 0.02, 1.0
    dmin, dmax, width, mid, power = 0.9, 0.95, 0.001, 0.5, 2.0

    imp_x = jnp.abs(pos) / width
    imp_a = (1.0 / mid ** (power - 1)) * imp_x**power
    imp_b = 1 - (1.0 / (1 - mid) ** (power - 1)) * (1 - imp_x) ** power
    imp_y = jnp.where(imp_x < mid, imp_a, imp_b)
    imp = dmin + imp_y * (dmax - dmin)
    imp = jnp.clip(imp, dmin, dmax)
    imp = jnp.where(imp_x > 1.0, dmax, imp)

    b = 2 / (dmax * timeconst)
    k = 1 / (dmax * dmax * timeconst * timeconst * dampratio * dampratio)
    aref = -b * vel - k * imp * pos
    return imp, aref


def _jacobian(p: _Plan, q, com, cdof, cpos, cpen):
    """Contact + limit constraint rows (constraint.py:69-121).

    Returns (rows, pos (nr,S,L), diag (nr,S,L)) where `rows` is a list of
    nr sparse jacobian rows, each a dict {dof -> (S,L) coefficient}.  The
    sparsity is static — contact rows touch only the contact link's
    ancestor-chain dofs, limit rows exactly one dof — so every downstream
    product (J qd, J M^-1, J M^-1 J^T, J^T x) skips structural zeros at
    trace time; dropping exact-zero terms leaves the float sums unchanged.
    """
    cdof_ang, cdof_vel = cdof
    jac_rows: List[dict] = []
    pos_rows, diag_rows = [], []

    for c in range(p.nc):
        l = p.c_link[c]
        fric = p.c_friction[c]
        n = p.c_normal[c]
        # static pyramid directions: (d * f - normal) for d in orthogonals(n)
        pvec, qvec = _orthogonals_np(n)
        dirs = [
            -(d * f - n)  # diff = -a, so fold the sign into the direction
            for d in (pvec, qvec)
            for f in (-fric, fric)
        ]
        active = (cpen[c] > 0).astype(q.dtype)
        # point jacobian rows of the contact link's ancestor chain
        a_vel = {}
        for d in range(p.nd):
            if p.dof_anc[l, d] > 0:
                a_vel[d] = cdof_vel[d] - _cross(cpos[c] - com, cdof_ang[d])
        for dvec in dirs:
            # static 3-vector dot: components fold in as scalar immediates
            jac_rows.append(
                {
                    d: (
                        float(dvec[0]) * av[0]
                        + float(dvec[1]) * av[1]
                        + float(dvec[2]) * av[2]
                    )
                    * active
                    for d, av in a_vel.items()
                }
            )
            pos_rows.append(-cpen[c] * active)
            t = float(p.link_invweight[l])
            diag_rows.append(
                (2 * fric * fric * (t + fric * fric * t)) * active
            )

    if p.limit is not None:
        lo, hi = p.limit
        for qi, d in zip(p.lim_qs, p.lim_dofs):
            pos_min = q[qi] - float(lo[d])
            pos_max = float(hi[d]) - q[qi]
            pos = jnp.minimum(jnp.minimum(pos_min, pos_max), 0.0)
            side = ((pos_min < pos_max) * 2 - 1) * (pos < 0)
            jac_rows.append({d: side.astype(q.dtype)})
            pos_rows.append(pos)
            diag_rows.append(float(p.dof_invweight[d]) * (pos < 0))

    if not jac_rows:
        return None, None, None
    return jac_rows, jnp.stack(pos_rows), jnp.stack(diag_rows)


def _orthogonals_np(n: onp.ndarray) -> Tuple[onp.ndarray, onp.ndarray]:
    """maths.orthogonals for a static normal, in numpy."""
    n = onp.asarray(n, onp.float64)
    n_sqr = n[2] * n[2]
    a = n[1] * n[1] + (n_sqr if n_sqr > 0.5 else n[0] * n[0])
    k = onp.sqrt(a)
    if a > 0.5:
        p = onp.array([0.0, -n[2], n[1]]) * k
        q = onp.array([a * k, -n[0] * p[2], n[0] * p[1]])
    else:
        p = onp.array([-n[1], n[0], n[1]]) * k
        q = onp.array([-n[2] * p[1], n[2] * p[0], a * k])
    return p.astype(onp.float32), q.astype(onp.float32)


def _fista(a, b, maxiter, maxls=5):
    """constraint._fista_nnls on (nr,nr,S,L)/(nr,S,L) stacks."""
    nr = b.shape[0]

    def value_grad(x):
        r = _mv(a, x) + b
        return 0.5 * jnp.sum(r * r, axis=0), _mtv(a, r)

    def line_search(y, f_y, g_y, eta):
        etas = [eta * (0.5**k) for k in range(maxls)]
        cands = [jnp.maximum(y - e[None] * g_y, 0.0) for e in etas]
        oks, fcs = [], []
        for e, cand in zip(etas, cands):
            diff = cand - y
            r = _mv(a, cand) + b
            f_cand = 0.5 * jnp.sum(r * r, axis=0)
            bound = (
                f_y
                + jnp.sum(diff * g_y, axis=0)
                + 0.5 / e * jnp.sum(diff * diff, axis=0)
            )
            oks.append(f_cand <= bound + 1e-12)
            fcs.append(f_cand)
        any_ok = functools.reduce(jnp.logical_or, oks)
        # first accepted index via a select chain (no gathers in Mosaic)
        x_next = cands[0]
        eta_sel = etas[0]
        taken = oks[0]
        for k in range(1, maxls):
            take_k = jnp.logical_and(oks[k], jnp.logical_not(taken))
            x_next = jnp.where(take_k[None], cands[k], x_next)
            eta_sel = jnp.where(take_k, etas[k], eta_sel)
            taken = jnp.logical_or(taken, oks[k])
        x_next = jnp.where(any_ok[None], x_next, cands[0])
        eta_out = jnp.where(any_ok, eta_sel, etas[-1] * 0.5)
        return x_next, eta_out

    x = jnp.zeros_like(b)
    y = x
    t = jnp.ones_like(b[0])
    eta = 1.0 / (jnp.max(jnp.sum(jnp.abs(a), axis=1), axis=0) + 1e-10)
    for _ in range(maxiter):
        f_y, g_y = value_grad(y)
        x_next, eta = line_search(y, f_y, g_y, eta)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y = x_next + (((t - 1.0) / t_next))[None] * (x_next - x)
        x = x_next
        t = t_next
        eta = eta * 1.5
    return x


def _integrate(p: _Plan, q, qd, qdd):
    """Semi-implicit Euler (generalized/integrator.py:22-50)."""
    dt = p.dt
    qd = qd + qdd * dt
    outs = []
    for l, t in enumerate(p.link_types):
        qo, do = p.q_off[l], p.qd_off[l]
        if t == "f":
            pos = q[qo : qo + 3] + qd[do : do + 3] * dt
            rot = q[qo + 3 : qo + 7]
            ang = qd[do + 3 : do + 6]
            ang_norm = jnp.sqrt(jnp.sum(ang * ang, axis=0)) + 1e-8
            axis = ang / ang_norm[None]
            qrot = _quat_rot_axis(axis, dt * ang_norm)
            rot = _qmul(rot, qrot)
            rot = rot / jnp.sqrt(jnp.sum(rot * rot, axis=0))[None]
            outs.append(pos)
            outs.append(rot)
        else:
            w = p.q_width[l]
            outs.append(q[qo : qo + w] + qd[do : do + w] * dt)
    return jnp.concatenate(outs, axis=0), qd


# frame counts at or above this roll into a fori_loop inside the kernel
# (trades a little scheduling freedom for much faster Mosaic compiles)
_ROLL_MIN = 3


def _build_tile_frames(sys: System, n_frames: int, tile: Tuple[int, int]):
    """Returns tile_frames(q, qd, minv, act) -> outputs, all (..., S, L).

    `tile` is the (sublane, lane) env-tile shape static constants splat to.
    Outputs: (q, qd, minv, x_pos (nl,3), x_rot (nl,4), xd_ang (nl,3),
    xd_vel (nl,3), c_pos (nc,3), c_pen (nc,)) with trailing env dims.
    """
    p = _Plan(sys, tile)

    def step(carry, act):
        q, qd, minv_prev = carry
        with jax.named_scope("fk"):
            x_pos, x_rot = _fk(p, q)
        with jax.named_scope("contacts"):
            cpos, cpen = _contacts(p, x_pos, x_rot)
        with jax.named_scope("com"):
            com, cinr, cd, cdof, cdofd = _transform_com(p, q, qd, x_pos, x_rot)
        with jax.named_scope("massmx"):
            mx = _mass_matrix(p, cinr, cdof)
        with jax.named_scope("inv_ns"):
            minv = _inv_ns(mx, minv_prev)
        with jax.named_scope("jacobian"):
            jac, cpos_rows, cdiag = _jacobian(p, q, com, cdof, cpos, cpen)

        # qf_smooth = passive - bias + tau (dynamics.forward:161-163)
        with jax.named_scope("bias"):
            bias = _bias(p, qd, cinr, cd, cdof, cdofd)
        tau = [jnp.zeros_like(qd[0]) for _ in range(p.nd)]
        for k, d in enumerate(p.act_qdid):
            force = jnp.clip(act[k], float(p.act_lo[k]), float(p.act_hi[k]))
            tau[d] = tau[d] + float(p.act_gear[k]) * force
        qf_smooth = []
        for d in range(p.nd):
            l = p.dof_link[d]
            passive = -float(p.damping[d]) * qd[d]
            if p.link_types[l] != "f" and float(p.stiffness[d]) != 0.0:
                qi = p.q_off[l] + (d - p.qd_off[l])
                passive = passive - q[qi] * float(p.stiffness[d])
            qf_smooth.append(passive - bias[d] + tau[d])
        qf_smooth = jnp.stack(qf_smooth)

        # constraint force (constraint.force, constraint.py:180-191)
        if jac is not None:
            nr = len(jac)
            with jax.named_scope("amat"):
                add = lambda terms: functools.reduce(jnp.add, terms)
                jqd = jnp.stack(
                    [add([v * qd[d] for d, v in row.items()]) for row in jac]
                )
                imp, aref = _imp_aref(cpos_rows, jqd)
                # jm[i] = row_i @ minv over the row's support: (nd, S, L)
                jm = [
                    add([v[None] * minv[d] for d, v in row.items()])
                    for row in jac
                ]
                diag_add = cdiag * (1 - imp) / imp
                # amat = J M^-1 J^T + diag(regularizer).  Symmetric, so only
                # the upper triangle is computed and mirrored (the dropped
                # lower half differs at float round-off only); each entry
                # contracts over the SPARSER row's support.  No (nr,nr) ->
                # (nr,nr,1,1) identity reshape (Mosaic can't shape-cast
                # tiled dims into leading positions).
                cell = [[None] * nr for _ in range(nr)]
                for i in range(nr):
                    for j in range(i, nr):
                        ri, rj = jac[i], jac[j]
                        if len(rj) <= len(ri):
                            v = add([w * jm[i][d] for d, w in rj.items()])
                        else:
                            v = add([w * jm[j][d] for d, w in ri.items()])
                        if i == j:
                            v = v + diag_add[i]
                        cell[i][j] = v
                        if i != j:
                            cell[j][i] = v
                amat = jnp.stack([jnp.stack(r) for r in cell])
                bvec = jnp.stack(
                    [_vdot(jm_i, qf_smooth) for jm_i in jm]
                ) - aref
            with jax.named_scope("fista"):
                xsol = _fista(amat, bvec, maxiter=p.solver_iters)
                # qf_c = J^T x over each dof's incident rows
                qf_c = jnp.stack(
                    [
                        add(
                            [row[d] * xsol[i] for i, row in enumerate(jac) if d in row]
                            or [jnp.zeros_like(qd[0])]
                        )
                        for d in range(p.nd)
                    ]
                )
        else:
            qf_c = jnp.zeros_like(qd)

        # dof damping folded into M^-1 via the first-order inverse expansion
        # (pipeline.py:37-41): minv - minv @ diag(damping*dt) @ minv
        with jax.named_scope("integrate"):
            dcol = p.cvec(p.damping.astype(onp.float32) * onp.float32(p.dt))[None]
            # M^-1 diag(damping dt) M^-1 is symmetric: triangle + mirror
            minv_d = minv - _mm_sym(minv * dcol, minv)
            qdd = _mv(minv_d, qf_smooth + qf_c)
            q, qd = _integrate(p, q, qd, qdd)
        return (q, qd, minv)

    def tile_frames(q, qd, minv, act):
        carry = (q, qd, minv)
        if n_frames >= _ROLL_MIN:
            # roll identical frames into fori_loop: Mosaic compile time
            # scales with unrolled op count (cf. sim/kernels.py _ROLL_MIN)
            carry = jax.lax.fori_loop(
                0, n_frames, lambda _, c: step(c, act), carry
            )
        else:
            for _ in range(n_frames):
                carry = step(carry, act)
        q, qd, minv = carry
        # final refresh of world transforms + contacts for the State
        x_pos, x_rot = _fk(p, q)
        xd_ang, xd_vel = _fk_vel(p, q, qd, x_pos, x_rot)
        cpos, cpen = _contacts(p, x_pos, x_rot)
        out = dict(
            q=q,
            qd=qd,
            minv=minv,
            x_pos=jnp.stack(x_pos) if p.nl else q[:0],
            x_rot=jnp.stack(x_rot),
            xd_ang=jnp.stack(xd_ang),
            xd_vel=jnp.stack(xd_vel),
        )
        if p.nc:
            out["c_pos"] = jnp.stack(cpos)
            out["c_pen"] = jnp.stack(cpen)
        return out

    return tile_frames, p


# ---------------------------------------------------------------------------
# pallas_call wrapper: batched State-level env-step physics
# ---------------------------------------------------------------------------

LANE = 128

_OUT_KEYS = ("q", "qd", "minv", "x_pos", "x_rot", "xd_ang", "xd_vel",
             "c_pos", "c_pen")


def _build_call(
    sys: System,
    n_frames: int,
    num_envs: int,
    interpret: bool = False,
    sub: Optional[int] = None,
):
    """The raw pallas_call over env tiles plus its plan and output schema.

    Returns (call, p, out_schema) where `call(q_t, qd_t, minv_t, act_t)`
    takes/returns arrays in tiled layout (lead..., n_rows, LANE).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert num_envs % LANE == 0, num_envs
    n_rows = num_envs // LANE
    if sub is None:
        sub = 8 if n_rows % 8 == 0 else n_rows
    assert n_rows % sub == 0, (n_rows, sub)
    grid = (n_rows // sub,)
    tile_frames, p = _build_tile_frames(sys, n_frames, (sub, LANE))

    out_schema = [("q", (p.nq,)), ("qd", (p.nd,)), ("minv", (p.nd, p.nd)),
                  ("x_pos", (p.nl, 3)), ("x_rot", (p.nl, 4)),
                  ("xd_ang", (p.nl, 3)), ("xd_vel", (p.nl, 3))]
    if p.nc:
        out_schema += [("c_pos", (p.nc, 3)), ("c_pen", (p.nc,))]

    def kernel(q_ref, qd_ref, minv_ref, act_ref, *out_refs):
        out = tile_frames(q_ref[:], qd_ref[:], minv_ref[:], act_ref[:])
        for ref, (key, _) in zip(out_refs, out_schema):
            ref[:] = out[key]

    def spec(lead: Tuple[int, ...]):
        nlead = len(lead)
        return pl.BlockSpec(
            lead + (sub, LANE),
            lambda i, _n=nlead: (0,) * _n + (i, 0),
            memory_space=pltpu.VMEM,
        )

    na = max(len(p.act_qdid), 1)
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec((p.nq,)), spec((p.nd,)), spec((p.nd, p.nd)), spec((na,))],
        out_specs=[spec(lead) for _, lead in out_schema],
        out_shape=[
            jax.ShapeDtypeStruct(lead + (n_rows, LANE), jnp.float32)
            for _, lead in out_schema
        ],
        interpret=interpret,
        # humanoid-scale systems (nd=23, ~80 constraint rows) can exceed
        # Mosaic's default 16 MB scoped VMEM; see lowering.VMEM_LIMIT_BYTES
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )
    return call, p, out_schema


def build_tiled_chain_fn(
    sys: System,
    n_frames: int,
    num_envs: int,
    sub: Optional[int] = None,
    interpret: bool = False,
):
    """Tiled-space env-step physics for rollout chains.

    Returns (step_t, out_schema) where `step_t((q_t, qd_t, minv_t), act_t)`
    -> ((q_t, qd_t, minv_t), outs) keeps the carried state in the kernel's
    native (lead..., n_rows, LANE) layout, so a lax.scan over steps pays the
    (B, ...) <-> tiled relayout once per rollout instead of once per step.
    """
    call, p, out_schema = _build_call(sys, n_frames, num_envs, interpret, sub)
    idx = {k: i for i, (k, _) in enumerate(out_schema)}

    def step_t(carry, act_t):
        q_t, qd_t, minv_t = carry
        outs = call(q_t, qd_t, minv_t, act_t)
        return (outs[idx["q"]], outs[idx["qd"]], outs[idx["minv"]]), outs

    return step_t, out_schema


def build_pipeline_step_fn(
    sys: System,
    n_frames: int,
    num_envs: int,
    interpret: bool = False,
    sub: Optional[int] = None,
):
    """Batched fused env-step physics: (State[B], act[B, na]) -> State[B].

    B = num_envs must be a multiple of 128.  Uses the square-vreg env layout
    of brax_tpu/sim/kernels.py:1237-1246: env axis as trailing
    (sublane, lane) tiles, one grid program per tile.  interpret=True runs
    the pallas_call in interpreter mode (CPU CI parity tests).

    `sub` overrides the sublane-tile height (default 8 = one vreg row).
    Larger tiles (16/32) process several vregs per op, which fills the
    VPU's dependency-stall slots in this kernel's long serial chains (NS /
    FISTA iterations) at the cost of a proportionally larger VMEM working
    set — see tools/bench_v2_generalized.py's sweep.
    """
    n_rows = num_envs // LANE
    call, p, out_schema = _build_call(sys, n_frames, num_envs, interpret, sub)
    na = max(len(p.act_qdid), 1)

    # static contact metadata for rebuilding State.contact
    c_normal = onp.stack(p.c_normal) if p.nc else onp.zeros((0, 3), onp.float32)
    c_fric = onp.asarray(p.c_friction, onp.float32)
    c_elast = onp.asarray(p.c_elasticity, onp.float32)
    c_link = onp.asarray(p.c_link, onp.int32)

    def to_tile(x):
        # (B, ...lead) -> (...lead, n_rows, LANE)
        lead = tuple(range(1, x.ndim))
        return jnp.transpose(x, lead + (0,)).reshape(x.shape[1:] + (n_rows, LANE))

    def from_tile(x):
        # (...lead, n_rows, LANE) -> (B, ...lead)
        x = x.reshape(x.shape[:-2] + (num_envs,))
        return jnp.moveaxis(x, -1, 0)

    def step(state: State, act: Array) -> State:
        act = jnp.asarray(act, jnp.float32)
        if act.ndim == 1 or act.shape[-1] == 0:
            act = jnp.zeros((num_envs, na), jnp.float32)
        outs = call(
            to_tile(state.q.astype(jnp.float32)),
            to_tile(state.qd.astype(jnp.float32)),
            to_tile(state.mass_mx_inv.astype(jnp.float32)),
            to_tile(act),
        )
        out = {key: from_tile(o) for (key, _), o in zip(out_schema, outs)}
        x = Transform(pos=out["x_pos"], rot=out["x_rot"])
        xd_state = state.xd.replace(ang=out["xd_ang"], vel=out["xd_vel"])
        new = state.replace(
            q=out["q"],
            qd=out["qd"],
            x=x,
            xd=xd_state,
            mass_mx_inv=out["minv"],
        )
        if p.nc and state.contact is not None:
            bc = lambda v: jnp.broadcast_to(
                jnp.asarray(v)[None], (num_envs,) + v.shape
            )
            contact = state.contact.replace(
                pos=out["c_pos"],
                normal=bc(c_normal),
                penetration=out["c_pen"],
                friction=bc(c_fric),
                elasticity=bc(c_elast),
                link_idx=(bc(c_link), bc(-onp.ones_like(c_link))),
            )
            new = new.replace(contact=contact)
        return new

    return step


# ---------------------------------------------------------------------------
# transparent dispatch: PipelineEnv calls pipeline steps per env; under vmap
# the custom batching rule reroutes the whole batch into the fused kernel
# ---------------------------------------------------------------------------

_ENABLED = False
_FORCE_INTERPRET = False
_STEP_CACHE: dict = {}
_CUSTOM_CACHE: dict = {}


def enable(on: bool = True):
    """Globally enables fused-kernel dispatch for vmapped generalized steps."""
    global _ENABLED
    _ENABLED = on


def enabled() -> bool:
    return _ENABLED


def force_interpret(on: bool = True):
    """Route the vmapped dispatch through the INTERPRETED kernel on CPU.

    Without this, a non-TPU backend silently falls back to the jnp scan,
    which would make CI kernel-on/off training-equivalence tests vacuous:
    they must execute the actual kernel body (in interpreter mode) to
    guard its numerics against the XLA path."""
    global _FORCE_INTERPRET
    _FORCE_INTERPRET = on
    _STEP_CACHE.clear()


def _with_vjp(sys: System, n_frames: int, kernel_fn):
    """Pallas forward, XLA backward: the Mosaic kernel has no autodiff rule,
    so the backward pass re-derives gradients through the jnp pipeline (the
    two paths agree to float32 round-off)."""
    from brax_tpu.v2.generalized import pipeline as g_pipeline

    def jnp_path(state, act):
        def f(s, _):
            return g_pipeline.step(sys, s, act), None

        return jax.vmap(
            lambda s, a: jax.lax.scan(
                lambda c, _: (g_pipeline.step(sys, c, a), None), s, (), n_frames
            )[0]
        )(state, act)

    @jax.custom_vjp
    def step(state, act):
        return kernel_fn(state, act)

    def fwd(state, act):
        return kernel_fn(state, act), (state, act)

    def bwd(res, ct):
        state, act = res
        _, vjp = jax.vjp(jnp_path, state, act)
        return vjp(ct)

    step.defvjp(fwd, bwd)
    return step


def custom_pipeline_step_for(sys: System, n_frames: int):
    """(pipeline_state, act) -> pipeline_state over n_frames physics steps.

    Unbatched calls run the jnp scan; under vmap the custom batching rule
    reroutes the whole batch into the fused Pallas kernel when supported on
    this backend.  The System must be concrete: its parameters bake in.
    """
    key = (id(sys), n_frames)
    hit = _CUSTOM_CACHE.get(key)
    if hit is not None:
        return hit[1]

    from jax import custom_batching

    from brax_tpu.v2.generalized import pipeline as g_pipeline

    def scan_path(state, act):
        def f(s, _):
            return g_pipeline.step(sys, s, act), None

        return jax.lax.scan(f, state, (), n_frames)[0]

    @custom_batching.custom_vmap
    def custom_step(state, act):
        return scan_path(state, act)

    @custom_step.def_vmap
    def _vmap_rule(axis_size, in_batched, state, act):
        state_b, act_b = in_batched
        core_b = all(
            jax.tree_util.tree_leaves(
                (state_b.q, state_b.qd, state_b.mass_mx_inv)
            )
        ) and bool(jax.tree_util.tree_leaves(act_b)[0])
        if (
            core_b
            and supported(sys)
            and axis_size % LANE == 0
            and (
                jax.default_backend() in ("tpu", "axon") or _FORCE_INTERPRET
            )
        ):
            fn = _STEP_CACHE.get((key, axis_size, _FORCE_INTERPRET))
            if fn is None:
                fn = build_pipeline_step_fn(
                    sys, n_frames, axis_size, interpret=_FORCE_INTERPRET
                )
                fn = _with_vjp(sys, n_frames, fn)
                _STEP_CACHE[(key, axis_size, _FORCE_INTERPRET)] = fn
            out = fn(state, act)
            out_batched = state_b.replace(
                q=True,
                qd=True,
                x=jax.tree_util.tree_map(lambda _: True, state_b.x),
                xd=jax.tree_util.tree_map(lambda _: True, state_b.xd),
                mass_mx_inv=True,
            )
            if state.contact is not None:
                out_batched = out_batched.replace(
                    contact=jax.tree_util.tree_map(
                        lambda _: True, state_b.contact
                    )
                )
            return out, out_batched
        in_axes = jax.tree_util.tree_map(
            lambda b: 0 if b else None, in_batched
        )
        out = jax.vmap(scan_path, in_axes=tuple(in_axes))(state, act)
        out_batched = jax.tree_util.tree_map(lambda _: True, state_b)
        return out, out_batched

    _CUSTOM_CACHE[key] = (sys, custom_step)
    return custom_step
