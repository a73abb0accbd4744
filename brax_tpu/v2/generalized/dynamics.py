"""Smooth forward/inverse dynamics in the subtree-CoM frame.

Parity with reference brax/v2/generalized/dynamics.py: transform_com moves
inertias/dofs/velocities into a frame centered at the system CoM (MuJoCo's
"cinert/cdof" formulation), inverse() is the recursive Newton-Euler bias
force, forward() combines passive + bias + applied tau.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import masks, scan
from brax_tpu.v2.base import Force, Motion, System, Transform
from brax_tpu.v2.generalized.base import State

Array = jax.Array


def transform_com(sys: System, state: State) -> State:
    """Updates com, cinr, cd, cdof, cdofd from q/qd/x/xd.

    Parity: reference dynamics.py:25-127.
    """
    xi = state.x.do(sys.link.inertia.transform)
    mass = sys.link.inertia.mass
    com = jnp.sum(mass[:, None] * xi.pos, axis=0) / jnp.sum(mass)
    cinr = xi.replace(pos=xi.pos - com).do(sys.link.inertia)

    # dof motions in a world frame centered at the subtree CoM.  free links
    # anchor to themselves; others to their parent joint frame
    parent_idx = jnp.array(
        [
            i if t == "f" else p
            for i, (t, p) in enumerate(zip(sys.link_types, sys.link_parents))
        ]
    )
    parent = state.x.concatenate(Transform.zero(shape=(1,))).take(parent_idx)
    j = parent.do(sys.link.transform).do(sys.link.joint)

    def cdof_fn(typ, q, motion):
        if typ == "f":
            return motion

        rot, _ = maths.normalize_with_norm(maths.quat_rot_axis(motion.ang, q))
        jt = Transform(pos=motion.vel * q[:, None], rot=rot)
        num_dofs = int(typ)
        s = (-1, num_dofs)
        jt_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), jt)
        jd_stack = jax.tree_util.tree_map(lambda x: x.reshape(s + x.shape[1:]), motion)

        # each dof's motion seen through the preceding dofs' joint transforms
        acc = Transform.zero(shape=(jt_stack.pos.shape[0],))
        jds = []
        for i in range(num_dofs):
            jd_i = jax.tree_util.tree_map(lambda x: x[:, i], jd_stack)
            jds.append(acc.inv().do(jd_i))
            jt_i = jax.tree_util.tree_map(lambda x: x[:, i], jt_stack)
            acc = acc.do(jt_i)

        # interleave back to per-dof rows
        out = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x, axis=1).reshape((-1, 3)), *jds
        )
        return out

    cdof = scan.link_types(sys, cdof_fn, "qd", "d", state.q, sys.dof.motion)
    dof_link = sys.dof_link()
    cdof = cdof.replace(ang=maths.rotate(cdof.ang, j.take(dof_link).rot))
    cdof = Transform.create(pos=com - j.pos).take(dof_link).do(cdof)
    cdof_qd = jax.tree_util.tree_map(lambda x: x * state.qd[:, None], cdof)

    # down the tree: accumulate per-link CoM-frame velocity.  The tree prefix
    # sum is linear, so it is one masked matmul with the static ancestor-dof
    # indicator instead of a level-by-level scan (see v2/masks.py)
    dof_anc = jnp.asarray(masks.ancestor_dofs(sys))
    cd = Motion(ang=dof_anc @ cdof_qd.ang, vel=dof_anc @ cdof_qd.vel)

    # cdofd: velocity of each cdof axis, from the velocity accumulated
    # through the preceding dofs of the same link
    def cdofd_fn(typ, cd, cdof, cdof_qd):
        if typ == "f":
            # free links: velocity-product accel from the link's own linear
            # velocity (sum of the 3 translational dof rows); the
            # translational rows themselves have zero cdofd
            cdof_qd6 = cdof_qd.reshape((-1, 6, 3))
            cd_lin = jax.tree_util.tree_map(
                lambda x: jnp.sum(x[:, 0:3], axis=1)[:, None, :], cdof_qd6
            )
            cdof6 = cdof.reshape((-1, 6, 3))
            cdofd = Motion(
                ang=jnp.cross(cd_lin.ang, cdof6.ang),
                vel=jnp.cross(cd_lin.ang, cdof6.vel)
                + jnp.cross(cd_lin.vel, cdof6.ang),
            )
            cdofd = jax.tree_util.tree_map(
                lambda x: x.at[:, 0:3].set(jnp.zeros(3)), cdofd
            )
            return cdofd.reshape((-1, 3))

        num_dofs = int(typ)
        cdof_qd_s = jax.tree_util.tree_map(
            lambda x: x.reshape((cd.ang.shape[0], num_dofs, 3)), cdof_qd
        )
        cds = [cd]
        for i in range(num_dofs - 1):
            cds.append(
                cds[-1]
                + jax.tree_util.tree_map(lambda x: x[:, i], cdof_qd_s)
            )
        cd_all = jax.tree_util.tree_map(
            lambda *x: jnp.stack(x, axis=1).reshape((-1, 3)), *cds
        )
        return cd_all.cross(cdof)

    cd_p = cd.concatenate(Motion.zero(shape=(1,))).take(parent_idx)
    cdofd = scan.link_types(sys, cdofd_fn, "ldd", "d", cd_p, cdof, cdof_qd)

    return state.replace(com=com, cinr=cinr, cd=cd, cdof=cdof, cdofd=cdofd)


def inverse(sys: System, state: State) -> Array:
    """RNE bias force: gravity + velocity-product terms (dynamics.py:130-175).

    Both tree reductions (ancestor accumulation of dof accelerations, subtree
    accumulation of spatial forces) are masked matmuls over static structure
    matrices — one MXU op each instead of unrolled level scans.
    """
    dof_anc = jnp.asarray(masks.ancestor_dofs(sys))
    cdofd_qd = jax.tree_util.tree_map(
        lambda x: x * state.qd[:, None], state.cdofd
    )
    cdd = Motion(
        ang=dof_anc @ cdofd_qd.ang,
        vel=dof_anc @ cdofd_qd.vel - sys.gravity,
    )

    # per-link spatial force: I*a + v x (I*v)
    cfrc_flat = state.cinr.mul(cdd) + state.cd.cross(state.cinr.mul(state.cd))

    sub = jnp.asarray(masks.subtree_links(sys))
    cfrc = Force(ang=sub @ cfrc_flat.ang, vel=sub @ cfrc_flat.vel)
    return state.cdof.dot(cfrc.take(sys.dof_link()))


def _passive(sys: System, q: Array, qd: Array) -> Array:
    """Joint stiffness/damping forces (dynamics.py:178-189)."""

    def stiffness_fn(typ, q, dof):
        if typ in "fb":
            return jnp.zeros_like(dof.stiffness)
        return -q * dof.stiffness

    frc = scan.link_types(sys, stiffness_fn, "qd", "d", q, sys.dof)
    frc -= sys.dof.damping * qd
    return frc


def forward(sys: System, state: State, tau: Array) -> Array:
    """Net smooth joint force: passive - bias + tau (dynamics.py:192-212)."""
    return _passive(sys, state.q, state.qd) - inverse(sys, state) + tau
