"""Cart + two stacked poles balance task on the v2 pipelines (classic
inverted double pendulum).  Reward follows the MuJoCo task: alive bonus
minus tip-distance and velocity penalties; terminate when the tip drops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class InvertedDoublePendulum(env.PipelineEnv):
    """Keep the double pole upright by sliding the cart."""

    def __init__(self, backend="generalized", n_frames=2, **kwargs):
        sys = mjcf.loads(assets.inverted_double_pendulum_xml())
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)

    def reset(self, rng: jnp.ndarray) -> env.State:
        rng, rng1, rng2 = jax.random.split(rng, 3)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.q_size(),), minval=-0.1, maxval=0.1
        )
        qd = 0.1 * jax.random.normal(rng2, (self.sys.qd_size(),))
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done = jnp.zeros(2)
        return env.State(pipeline_state, obs, reward, done, {})

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        ps = self.pipeline_step(state.pipeline_state, action)
        obs = self._get_obs(ps)

        tip = self._tip(ps)
        x, y = tip[0], tip[2]
        dist_penalty = 0.01 * x * x + (y - 2.0) ** 2
        v1, v2 = ps.qd[1], ps.qd[2]
        vel_penalty = 1e-3 * v1 * v1 + 5e-3 * v2 * v2
        alive_bonus = 10.0
        reward = alive_bonus - dist_penalty - vel_penalty
        done = jnp.where(y <= 1.0, 1.0, 0.0)
        return state.replace(pipeline_state=ps, obs=obs, reward=reward, done=done)

    def _tip(self, pipeline_state: base.State) -> jnp.ndarray:
        """World position of the second pole's free end."""
        end = jnp.array([0.0, 0.0, 0.6])
        return pipeline_state.x.pos[2] + maths.rotate(end, pipeline_state.x.rot[2])

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        q, qd = pipeline_state.q, pipeline_state.qd
        return jnp.concatenate(
            [
                q[:1],  # cart position
                jnp.sin(q[1:]),
                jnp.cos(q[1:]),
                jnp.clip(qd, -10.0, 10.0),
            ]
        )
