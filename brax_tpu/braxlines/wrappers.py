"""Env wrappers for skill-conditioned policies.

`SkillWrapper` samples a skill z from the discriminator prior at reset,
appends it to observations, and keeps it fixed over the episode (stored in
state.info).  Reward stays the env's own; the skill reward is relabeled on
collected batches by the trainer (brax_tpu.braxlines.train), so
discriminator updates never recompile the env.  Parity role:
braxlines/vgcrl/utils.py ParameterizeWrapper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.braxlines.discriminators import SkillDiscriminator


class SkillWrapper(base.Wrapper):
    def __init__(self, env: base.Env, disc: SkillDiscriminator):
        super().__init__(env)
        self.disc = disc

    @property
    def observation_size(self) -> int:
        return self.env.observation_size + self.disc.z_size

    def reset(self, rng) -> base.State:
        rng_env, rng_z = jax.random.split(rng)
        state = self.env.reset(rng_env)
        z = self.disc.sample_p(rng_z)
        state.info["skill_z"] = z
        obs = jnp.concatenate([state.obs, z], axis=-1)
        return state.replace(obs=obs, reward=jnp.zeros_like(state.reward))

    def step(self, state: base.State, action) -> base.State:
        z = state.info["skill_z"]
        inner = state.replace(obs=state.obs[..., : self.env.observation_size])
        nstate = self.env.step(inner, action)
        nstate.info["skill_z"] = z
        obs = jnp.concatenate([nstate.obs, z], axis=-1)
        return nstate.replace(obs=obs)
