"""Trivial kinematic env for trainer unit tests.

Parity: /root/reference/brax/envs/fast.py:16-51.
"""

from __future__ import annotations

import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.sim.config import Config
from brax_tpu.sim.types import QP


class Fast(base.Env):
    """Trains an agent to go fast."""

    def __init__(self, **kwargs):
        super().__init__(config=None)
        self._dt = 0.02

    def reset(self, rng) -> base.State:
        zero = jnp.zeros(1)
        qp = QP(pos=zero, vel=zero, rot=zero, ang=zero)
        obs = jnp.zeros(2)
        reward, done = jnp.zeros(2)
        return base.State(qp, obs, reward, done)

    def step(self, state: base.State, action) -> base.State:
        vel = state.qp.vel + (action > 0) * self._dt
        pos = state.qp.pos + vel * self._dt

        qp = state.qp.replace(pos=pos, vel=vel)
        obs = jnp.array([pos[0], vel[0]])
        reward = pos[0]

        return state.replace(qp=qp, obs=obs, reward=reward)

    @property
    def observation_size(self):
        return 2

    @property
    def action_size(self):
        return 1
