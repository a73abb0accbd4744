"""Reacher 2-link arm on the v2 pipelines.

Reference parity: brax/v2 ships only ant as a v2 env (v2/envs/__init__.py);
this port follows the classic MuJoCo reacher task semantics (reach a random
planar target, reward = -distance - control cost) on the generalized
pipeline.  The fixed-base tree (no free root) exercises the world-anchored
joint-frame path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.v2 import base, mjcf
from brax_tpu.v2.envs import assets, env


class Reacher(env.PipelineEnv):
    """Drive the fingertip of a 2-link planar arm onto a random target."""

    def __init__(self, backend="generalized", n_frames=2, **kwargs):
        sys = mjcf.loads(assets.reacher_xml())
        super().__init__(sys=sys, backend=backend, n_frames=n_frames, **kwargs)

    def reset(self, rng: jnp.ndarray) -> env.State:
        rng, rng1, rng2, rng_t = jax.random.split(rng, 4)
        q = self.sys.init_q + jax.random.uniform(
            rng1, (self.sys.q_size(),), minval=-0.1, maxval=0.1
        )
        qd = jax.random.uniform(
            rng2, (self.sys.qd_size(),), minval=-0.005, maxval=0.005
        )
        # target anywhere in the reachable disk (radius 0.2); its slide
        # coordinates are q[2:4]
        target = self._random_target(rng_t)
        q = q.at[2:4].set(target)
        qd = qd.at[2:4].set(0.0)
        pipeline_state = self.pipeline_init(q, qd)
        obs = self._get_obs(pipeline_state)
        reward, done, zero = jnp.zeros(3)
        metrics = {"reward_dist": zero, "reward_ctrl": zero}
        return env.State(pipeline_state, obs, reward, done, metrics)

    def step(self, state: env.State, action: jnp.ndarray) -> env.State:
        ps = self.pipeline_step(state.pipeline_state, action)
        obs = self._get_obs(ps)
        # obs tail is (fingertip - target) in the plane
        reward_dist = -jnp.linalg.norm(obs[-3:])
        reward_ctrl = -jnp.sum(jnp.square(action))
        reward = reward_dist + reward_ctrl
        state.metrics.update(reward_dist=reward_dist, reward_ctrl=reward_ctrl)
        return state.replace(
            pipeline_state=ps, obs=obs, reward=reward, done=jnp.zeros(())
        )

    def _random_target(self, rng: jnp.ndarray) -> jnp.ndarray:
        """Uniform in the disk of radius 0.2 (always reachable)."""
        rng_r, rng_a = jax.random.split(rng)
        r = 0.2 * jnp.sqrt(jax.random.uniform(rng_r))
        ang = jnp.pi * 2.0 * jax.random.uniform(rng_a)
        return jnp.array([r * jnp.cos(ang), r * jnp.sin(ang)])

    def _fingertip(self, pipeline_state: base.State) -> jnp.ndarray:
        tip = jnp.array([0.11, 0.0, 0.0])
        return pipeline_state.x.pos[1] + maths.rotate(tip, pipeline_state.x.rot[1])

    def _get_obs(self, pipeline_state: base.State) -> jnp.ndarray:
        theta = pipeline_state.q[:2]
        target = pipeline_state.x.pos[2, :2]
        tip = self._fingertip(pipeline_state)
        return jnp.concatenate(
            [
                jnp.cos(theta),
                jnp.sin(theta),
                target,
                pipeline_state.qd[:2],
                tip - pipeline_state.x.pos[2],
            ]
        )
