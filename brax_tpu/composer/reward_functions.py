"""Reward-function library for composed scenes.

Each factory returns `fn(env, qp, prev_qp, action) -> (reward, done)`, where
`done` is this reward's termination vote (caught prey, pushed out of the
ring, ...).  Factories accept the common wrapper kwargs `scale`, `offset`
and `done_bonus`: raw reward r becomes `(r + offset) * scale`, plus
`done_bonus` where done fires.  Role parity:
/root/reference/brax/experimental/composer/reward_functions.py (wrapper
semantics at :50-68, distance/exp/direction rewards at :100-175) — the
reference threads Observer objects through obs dicts; here factories close
over component metadata and read the dense QP directly.
"""

from __future__ import annotations

import jax.numpy as jnp


def _wrap(raw_fn, scale: float = 1.0, offset: float = 0.0, done_bonus: float = 0.0):
    def fn(env, qp, prev_qp, action):
        r, d = raw_fn(env, qp, prev_qp, action)
        r = (r + offset) * scale
        r = jnp.where(d > 0, r + done_bonus, r)
        return r, d

    return fn


def _no_done(r):
    return r, jnp.zeros(())


def _dist_done(dist, min_dist: float, max_dist: float):
    done = jnp.zeros(())
    done = jnp.where(dist < min_dist, 1.0, done)
    done = jnp.where(dist > max_dist, 1.0, done)
    return done


# --- component rewards -------------------------------------------------------


def forward_velocity(comp: dict, weight: float = 1.0, axis: int = 0, **wrap_kw):
    """Velocity of the component root along an axis."""

    def raw(env, qp, prev_qp, action):
        dt = env.art.config.dt
        v = (qp.pos[comp["root_idx"], axis] - prev_qp.pos[comp["root_idx"], axis]) / dt
        return _no_done(weight * v)

    return _wrap(raw, **wrap_kw)


def alive_bonus(comp: dict, bonus: float = 1.0, **wrap_kw):
    def raw(env, qp, prev_qp, action):
        return _no_done(jnp.asarray(bonus, jnp.float32))

    return _wrap(raw, **wrap_kw)


def ctrl_cost(comp: dict, weight: float = 0.5, **wrap_kw):
    """Negative sum-of-squares control cost over the component's actuators."""

    def raw(env, qp, prev_qp, action):
        sel = jnp.array(comp["act_idx"], dtype=jnp.int32)
        return _no_done(-weight * jnp.sum(jnp.square(action[sel])))

    return _wrap(raw, **wrap_kw)


def control_penalty(comp: dict, **wrap_kw):
    """Negative L2 norm of the component's action slice (ref control_reward)."""

    def raw(env, qp, prev_qp, action):
        sel = jnp.array(comp["act_idx"], dtype=jnp.int32)
        return _no_done(-jnp.linalg.norm(action[sel]))

    return _wrap(raw, **wrap_kw)


def constant(comp: dict, value: float = 1.0, **wrap_kw):
    def raw(env, qp, prev_qp, action):
        return _no_done(jnp.asarray(value, jnp.float32))

    return _wrap(raw, **wrap_kw)


def root_goal(
    comp: dict,
    target_goal,
    sdcomp: str = "pos",
    indices=(0, 1, 2),
    min_dist: float = 0.0,
    max_dist: float = 1e8,
    **wrap_kw,
):
    """Negative distance of root pos/vel to a fixed target (ref root_goal)."""
    target = jnp.asarray(target_goal, jnp.float32)
    idx = jnp.asarray(indices, jnp.int32)

    def raw(env, qp, prev_qp, action):
        field = qp.pos if sdcomp == "pos" else qp.vel
        cur = field[comp["root_idx"]][idx]
        dist = jnp.linalg.norm(cur - target)
        return -dist, _dist_done(dist, min_dist, max_dist)

    return _wrap(raw, **wrap_kw)


def norm_velocity(comp: dict, indices=(0, 1), **wrap_kw):
    """Negative planar speed of the root; scale=-s makes it a run bonus
    (ref ma_descs.get_run_reward / norm_reward of root vel)."""
    idx = jnp.asarray(indices, jnp.int32)

    def raw(env, qp, prev_qp, action):
        return _no_done(-jnp.linalg.norm(qp.vel[comp["root_idx"]][idx]))

    return _wrap(raw, **wrap_kw)


# --- edge rewards ------------------------------------------------------------


def root_dist(
    comp_a: dict,
    comp_b: dict,
    min_dist: float = 0.0,
    max_dist: float = 1e8,
    indices=(0, 1, 2),
    **wrap_kw,
):
    """Negative root-to-root distance; done outside [min_dist, max_dist]
    (ref distance_reward :152-175: termination replaces clipping)."""
    idx = jnp.asarray(indices, jnp.int32)

    def raw(env, qp, prev_qp, action):
        d = qp.pos[comp_a["root_idx"]][idx] - qp.pos[comp_b["root_idx"]][idx]
        dist = jnp.linalg.norm(d)
        return -dist, _dist_done(dist, min_dist, max_dist)

    return _wrap(raw, **wrap_kw)


def distance(comp_a: dict, comp_b: dict, weight: float = 1.0, offset: float = 0.0,
             max_dist: float = 1e8, min_dist: float = 0.0):
    """Offset-minus-distance between roots (move-closer shaping)."""

    def fn(env, qp, prev_qp, action):
        d = jnp.linalg.norm(qp.pos[comp_a["root_idx"]] - qp.pos[comp_b["root_idx"]])
        d = jnp.clip(d, min_dist, max_dist)
        return weight * (offset - d), jnp.zeros(())

    return fn


def chase(comp_a: dict, comp_b: dict, weight: float = 1.0):
    """Reward for closing the distance to b since the previous step."""

    def fn(env, qp, prev_qp, action):
        d = jnp.linalg.norm(qp.pos[comp_a["root_idx"]] - qp.pos[comp_b["root_idx"]])
        d_prev = jnp.linalg.norm(
            prev_qp.pos[comp_a["root_idx"]] - prev_qp.pos[comp_b["root_idx"]]
        )
        return weight * (d_prev - d), jnp.zeros(())

    return fn


def exp_center_dist(
    comp_a: dict,
    comp_b: dict,
    which: str = "a",
    max_dist: float = 1e8,
    indices=(0, 1),
    **wrap_kw,
):
    """exp(-|root_xy|) of one endpoint; done when it leaves max_dist (the
    sumo ring reward, ref exp_norm_reward of root pos)."""
    comp = comp_a if which == "a" else comp_b
    idx = jnp.asarray(indices, jnp.int32)

    def raw(env, qp, prev_qp, action):
        dist = jnp.linalg.norm(qp.pos[comp["root_idx"]][idx])
        return jnp.exp(-dist), _dist_done(dist, 0.0, max_dist)

    return _wrap(raw, **wrap_kw)


def direction(comp_a: dict, comp_b: dict, which: str = "a", indices=(0, 1),
              **wrap_kw):
    """Move-toward-opponent reward (ref direction_reward :105-133): when the
    mover heads at the target and the target is fleeing, reward the component
    of the mover's velocity along the target's (reversed) unit velocity."""
    mover, target = (comp_a, comp_b) if which == "a" else (comp_b, comp_a)
    idx = jnp.asarray(indices, jnp.int32)

    def raw(env, qp, prev_qp, action):
        v0 = qp.vel[mover["root_idx"]][idx]
        v1 = qp.vel[target["root_idx"]][idx]
        p0 = qp.pos[mover["root_idx"]][idx]
        p1 = qp.pos[target["root_idx"]][idx]
        toward = jnp.sum((p1 - p0) * v0) > 0
        fleeing = jnp.sum((p0 - p1) * v1) > 0
        u1 = -v1 / (jnp.linalg.norm(v1) + 1e-8)
        r = jnp.where(toward & fleeing, jnp.sum(v0 * u1), 0.0)
        return _no_done(jnp.clip(r, 0.0))

    return _wrap(raw, **wrap_kw)


COMPONENT_REWARDS = {
    "forward_velocity": forward_velocity,
    "alive_bonus": alive_bonus,
    "ctrl_cost": ctrl_cost,
    "control_penalty": control_penalty,
    "constant": constant,
    "root_goal": root_goal,
    "norm_velocity": norm_velocity,
}
EDGE_REWARDS = {
    "distance": distance,
    "chase": chase,
    "root_dist": root_dist,
    "exp_center_dist": exp_center_dist,
    "direction": direction,
}
