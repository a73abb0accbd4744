"""JumpCheetah: halfcheetah rewarded for takeoff height, not speed.

Original task on our Halfcheetah scene (role parity with the reference's
jump_cheetah submission, biggym/registry/jump/envs/cheetah.py — written
fresh against brax_tpu's env API).
"""

import jax.numpy as jnp

from brax_tpu.envs import halfcheetah


class JumpCheetah(halfcheetah.Halfcheetah):
    """Reward = torso height gain above standing + airtime bonus - ctrl."""

    STAND_Z = 0.6

    def step(self, state, action):
        state = super().step(state, action)
        qp = state.qp
        z = qp.pos[0, 2]
        zvel = qp.vel[0, 2]
        # all feet off the ground proxy: lowest body above a clearance
        clearance = jnp.min(qp.pos[:, 2]) > 0.25
        reward = (
            5.0 * jnp.maximum(z - self.STAND_Z, 0.0)
            + 0.5 * jnp.maximum(zvel, 0.0)
            + 1.0 * clearance
            - 0.1 * jnp.sum(jnp.square(action))
        )
        return state.replace(reward=reward)
