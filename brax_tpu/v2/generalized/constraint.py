"""Constraint jacobians and the non-negative least-squares contact solver.

Parity with reference brax/v2/generalized/constraint.py, with one structural
difference: the reference delegates `min ||Ax + b||^2 s.t. x >= 0` to
jaxopt.ProjectedGradient (FISTA, backtracking line search, maxls=5); here the
same accelerated projected-gradient method is written directly in jnp as a
fixed-iteration `lax.scan` — fully jit/vmap/grad-compatible with no external
solver dependency, and with static shapes the TPU compiler can pipeline.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import masks
from brax_tpu.v2.base import Motion, System, Transform
from brax_tpu.v2.generalized.base import State

Array = jax.Array


def _pt_jac(
    sys: System, com: Array, cdof: Motion, pos: Array, link_idx: Array
) -> Array:
    """Translational point jacobian at world pos wrt link link_idx's dofs.

    Masks cdof rows to the ancestor chain of link_idx, then moves each dof's
    motion to the point.  Parity: reference constraint.py:28-58 — but the
    ancestor-chain membership is a static structure matrix (v2/masks.py)
    indexed by link_idx, not a per-contact tree scan.
    """
    dof_anc = jnp.asarray(masks.ancestor_dofs(sys))
    # link_idx == -1 means the world: out-of-range gather clamps/wraps, so
    # explicitly zero the mask
    mask = dof_anc[link_idx] * (link_idx > -1)
    cdof = jax.tree_util.tree_map(lambda x: x * mask[:, None], cdof)
    off = Transform.create(pos=pos - com)
    return off.do(cdof).vel


def _imp_aref(pos: Array, vel: Array) -> Tuple[Array, Array]:
    """Constraint impedance + offset acceleration.

    MuJoCo's solver-parameter formulation with default solref/solimp
    (timeconst 0.02, dampratio 1, dmin/dmax 0.9/0.95, width 0.001, mid 0.5,
    power 2).  Parity: reference constraint.py:61-91.
    """
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


def jac_limit(sys: System, state: State) -> Tuple[Array, Array, Array]:
    """Joint-limit rows of the constraint jacobian (constraint.py:94-122)."""
    if sys.dof.limit is None:
        return jnp.zeros((0, sys.qd_size())), jnp.zeros((0,)), jnp.zeros((0,))

    q_idx, qd_idx = sys.q_idx("123"), sys.qd_idx("123")
    pos_min = state.q[q_idx] - sys.dof.limit[0][qd_idx]
    pos_max = sys.dof.limit[1][qd_idx] - state.q[q_idx]
    pos = jnp.minimum(jnp.minimum(pos_min, pos_max), 0)

    side = ((pos_min < pos_max) * 2 - 1) * (pos < 0)
    jac = jnp.eye(sys.qd_size())[qd_idx] * side[:, None]
    diag = sys.dof.invweight[qd_idx] * (pos < 0)
    return jac, pos, diag


def jac_contact(sys: System, state: State) -> Tuple[Array, Array, Array]:
    """Contact rows: 4 pyramidal friction directions per contact point.

    Parity: reference constraint.py:125-164.
    """
    if state.contact is None:
        return jnp.zeros((0, sys.qd_size())), jnp.zeros((0,)), jnp.zeros((0,))

    def row_fn(contact):
        link_a, link_b = contact.link_idx
        a = _pt_jac(sys, state.com, state.cdof, contact.pos, link_a)
        b = _pt_jac(sys, state.com, state.cdof, contact.pos, link_b)
        diff = b - a

        jac = []
        for d in maths.orthogonals(contact.normal):
            for f in [-contact.friction, contact.friction]:
                jac.append(diff @ (d * f - contact.normal))
        jac = jnp.stack(jac)
        pos = -jnp.tile(contact.penetration, 4)
        t = sys.link.invweight[link_a] + sys.link.invweight[link_b] * (link_b > -1)
        diag = jnp.tile(t + contact.friction * contact.friction * t, 4)
        diag = 2 * contact.friction * contact.friction * diag
        return jax.tree_util.tree_map(
            lambda x: x * (contact.penetration > 0), (jac, pos, diag)
        )

    return jax.tree_util.tree_map(
        jnp.concatenate, jax.vmap(row_fn)(state.contact)
    )


def jacobian(sys: System, state: State) -> State:
    """Stacks contact + limit constraint rows into the state."""
    jpds = jac_contact(sys, state), jac_limit(sys, state)
    jac, pos, diag = jax.tree_util.tree_map(lambda *x: jnp.concatenate(x), *jpds)
    return state.replace(con_jac=jac, con_pos=pos, con_diag=diag)


def _fista_nnls(a: Array, b: Array, maxiter: int, maxls: int = 5) -> Array:
    """min 0.5||Ax + b||^2 s.t. x >= 0 by accelerated projected gradient.

    FISTA with Armijo backtracking: each iteration projects a gradient step
    from the momentum point onto the non-negative orthant, halving the step
    until the quadratic upper bound holds (at most maxls halvings).  Runs a
    fixed maxiter via lax.scan — static shapes, fully differentiable.
    """

    def value_grad(x):
        r = a @ x + b
        return 0.5 * jnp.dot(r, r), a.T @ r

    def line_search(y, f_y, g_y, eta):
        """All maxls halvings evaluated AT ONCE: the candidates for
        eta/2^k are independent, so their objective values come from one
        (maxls, nc) @ (nc, nc) matmul instead of maxls sequential matvecs
        (an MXU-shaped op with no loop-carried dependency).  Selection is
        identical to sequential backtracking: the first k whose quadratic
        upper bound holds wins."""
        etas = eta * (0.5 ** jnp.arange(maxls))  # (maxls,)
        cands = jnp.maximum(y[None, :] - etas[:, None] * g_y[None, :], 0.0)
        diffs = cands - y[None, :]
        f_cands = 0.5 * jnp.sum((cands @ a.T + b[None, :]) ** 2, axis=-1)
        bounds = (
            f_y
            + diffs @ g_y
            + 0.5 / etas * jnp.sum(diffs * diffs, axis=-1)
        )
        ok = f_cands <= bounds + 1e-12
        # first accepted index.  If none accept, sequential backtracking
        # left x_next at the eta0 candidate (it only overwrote on accept)
        # with eta fully halved — preserve exactly that behavior.
        k = jnp.where(jnp.any(ok), jnp.argmax(ok), 0)
        eta_out = jnp.where(jnp.any(ok), etas[k], etas[-1] * 0.5)
        return cands[k], eta_out

    def iteration(carry, _):
        x, y, t, eta = carry
        f_y, g_y = value_grad(y)
        x_next, eta = line_search(y, f_y, g_y, eta)
        t_next = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        y_next = x_next + ((t - 1.0) / t_next) * (x_next - x)
        # allow the stepsize to grow back so one hard iteration does not
        # permanently shrink it
        return (x_next, y_next, t_next, eta * 1.5), None

    x0 = jnp.zeros_like(b)
    # L-estimate for the initial stepsize: 1 / ||A||_inf-ish
    eta0 = 1.0 / (jnp.abs(a).sum(axis=1).max() + 1e-10)
    (x, _, _, _), _ = jax.lax.scan(
        iteration, (x0, x0, jnp.ones(()), eta0), None, length=maxiter
    )
    return x


def force(sys: System, state: State) -> Array:
    """Constraint force in joint coordinates (constraint.py:182-229)."""
    if state.con_jac.shape[0] == 0:
        return jnp.zeros(sys.qd_size())

    imp, aref = _imp_aref(state.con_pos, state.con_jac @ state.qd)
    a = state.con_jac @ state.mass_mx_inv @ state.con_jac.T
    a = a + jnp.diag(state.con_diag * (1 - imp) / imp)
    b = state.con_jac @ state.mass_mx_inv @ state.qf_smooth - aref

    x = _fista_nnls(a, b, maxiter=sys.solver_iterations)
    return state.con_jac.T @ x
