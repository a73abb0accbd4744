"""Reward-function library for composed scenes.

Each factory returns `fn(env, qp, prev_qp, action) -> scalar`.  Role parity:
/root/reference/brax/experimental/composer/reward_functions.py.
"""

from __future__ import annotations

import jax.numpy as jnp


def forward_velocity(comp: dict, weight: float = 1.0, axis: int = 0):
    """Velocity of the component root along an axis."""

    def fn(env, qp, prev_qp, action):
        dt = env.art.config.dt
        v = (qp.pos[comp["root_idx"], axis] - prev_qp.pos[comp["root_idx"], axis]) / dt
        return weight * v

    return fn


def alive_bonus(comp: dict, bonus: float = 1.0):
    def fn(env, qp, prev_qp, action):
        return jnp.asarray(bonus, jnp.float32)

    return fn


def ctrl_cost(comp: dict, weight: float = 0.5):
    def fn(env, qp, prev_qp, action):
        sel = jnp.array(comp["act_idx"], dtype=jnp.int32)
        return -weight * jnp.sum(jnp.square(action[sel]))

    return fn


def distance(comp_a: dict, comp_b: dict, weight: float = 1.0, offset: float = 0.0,
             max_dist: float = 1e8, min_dist: float = 0.0):
    """Negative distance between two component roots (move-closer reward)."""

    def fn(env, qp, prev_qp, action):
        d = jnp.linalg.norm(qp.pos[comp_a["root_idx"]] - qp.pos[comp_b["root_idx"]])
        d = jnp.clip(d, min_dist, max_dist)
        return weight * (offset - d)

    return fn


def chase(comp_a: dict, comp_b: dict, weight: float = 1.0):
    """Reward a for closing the distance to b since the previous step."""

    def fn(env, qp, prev_qp, action):
        d = jnp.linalg.norm(qp.pos[comp_a["root_idx"]] - qp.pos[comp_b["root_idx"]])
        d_prev = jnp.linalg.norm(
            prev_qp.pos[comp_a["root_idx"]] - prev_qp.pos[comp_b["root_idx"]]
        )
        return weight * (d_prev - d)

    return fn


COMPONENT_REWARDS = {
    "forward_velocity": forward_velocity,
    "alive_bonus": alive_bonus,
    "ctrl_cost": ctrl_cost,
}
EDGE_REWARDS = {
    "distance": distance,
    "chase": chase,
}
