"""Composite-rigid-body mass matrix and its inverse.

Parity with reference brax/v2/generalized/mass.py.  The CRB expansion
M[i, j] = cdof_j . (crb[link(i)] * cdof_i) is computed as one batched
inertia-multiply plus one (nd, 6) @ (6, nd) matmul — MXU-shaped instead of
the reference's nested per-row vmaps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import masks
from brax_tpu.v2.base import System
from brax_tpu.v2.generalized.base import State


def matrix(sys: System, state: State) -> jnp.ndarray:
    """(qd_size, qd_size) generalized mass matrix via CRB (mass.py:27-82)."""

    # up the tree: composite inertia of each subtree — the subtree sum is
    # linear, so it is one masked matmul per pytree leaf (see v2/masks.py)
    sub = jnp.asarray(masks.subtree_links(sys))
    crb = jax.tree_util.tree_map(
        lambda x: jnp.einsum("lj,j...->l...", sub, x), state.cinr
    )

    # f_i = crb[link(i)] * cdof_i as a (nd, 6) stack, then M = cdof6 @ f6.T
    f = crb.take(sys.dof_link()).mul(state.cdof)
    f6 = jnp.concatenate([f.ang, f.vel], axis=-1)
    cdof6 = jnp.concatenate([state.cdof.ang, state.cdof.vel], axis=-1)
    mx = f6 @ cdof6.T  # mx[i, j] = cdof_j . (crb[link(i)] * cdof_i)

    # zero out entries between dofs with no ancestor relationship
    mx = mx * jnp.asarray(masks.dof_pairs(sys))

    # lower triangle mirrored up, plus rotor armature on the diagonal
    mx = jnp.tril(mx) + jnp.tril(mx, -1).T
    return mx + jnp.diag(sys.dof.armature)


NS_ITERS = 4


def matrix_inv(sys: System, state: State, approximate: bool = False) -> State:
    """Updates mass_mx and mass_mx_inv (mass.py:85-104).

    approximate=True warm-starts Newton-Schulz from the previous step's
    inverse (reference mass.py:85-104) -- profiled on TPU this beats both
    batched LU and batched Cholesky inside the rollout loop; the exact SPD
    solve is used at init where there is no warm start.
    """
    mx = matrix(sys, state)
    if approximate:
        mx_inv = maths.inv_approximate(mx, state.mass_mx_inv, maxiter=NS_ITERS)
    else:
        mx_inv = jax.scipy.linalg.solve(mx, jnp.eye(sys.qd_size()), assume_a="pos")
    return state.replace(mass_mx=mx, mass_mx_inv=mx_inv)
