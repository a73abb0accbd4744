"""Domain randomization: vmap physics over batched System leaves.

The System is a plain pytree of dense arrays, so randomizing physics
parameters is just mapping an rng -> System function over keys and vmapping
`step` over the resulting stacked System.  Role parity:
/root/reference/brax/experimental/tracing/{customize,wrappers,randomizers}.py
(the reference needs a TracedConfig shim because its config is protobuf;
here the capability is native).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from brax_tpu.envs import base
from brax_tpu.sim.system import System


def randomize_system(
    sys: System, randomizer: Callable[[System, jax.Array], System], rngs
) -> System:
    """Returns a System whose traced leaves carry a leading batch axis.

    `randomizer(sys, rng) -> System` perturbs whatever leaves it likes
    (masses, inertias, joint limits, solver params...); static metadata must
    be left untouched.
    """
    return jax.vmap(lambda r: randomizer(sys, r))(rngs)


def friction_randomizer(scale_low: float = 0.5, scale_high: float = 1.5):
    """Scales contact friction uniformly (parity: tracing/randomizers.py:27+)."""

    def randomize(sys: System, rng: jax.Array) -> System:
        scale = jax.random.uniform(rng, (), minval=scale_low, maxval=scale_high)
        groups = tuple(
            g.replace(com=g.com.replace(friction=g.com.friction * scale))
            for g in sys.contact_groups
        )
        return sys.replace(contact_groups=groups)

    return randomize


def mass_randomizer(scale_low: float = 0.8, scale_high: float = 1.2):
    """Scales body masses (and inverse inertias to match)."""

    def randomize(sys: System, rng: jax.Array) -> System:
        scale = jax.random.uniform(
            rng, (sys.num_bodies,), minval=scale_low, maxval=scale_high
        )
        return sys.replace(
            mass=sys.mass * scale, inv_inertia=sys.inv_inertia / scale[:, None]
        )

    return randomize


def gravity_randomizer(scale_low: float = 0.9, scale_high: float = 1.1):
    """Scales gravity."""

    def randomize(sys: System, rng: jax.Array) -> System:
        scale = jax.random.uniform(rng, (), minval=scale_low, maxval=scale_high)
        integ = sys.integrator.replace(gravity=sys.integrator.gravity * scale)
        return sys.replace(integrator=integ)

    return randomize


class DomainRandomizationWrapper(base.Wrapper):
    """Batches an env over a randomized System population.

    Each batch element steps its own perturbed physics; reset keys must have
    a leading axis matching the population size.  Parity:
    tracing/wrappers.py:28-60.
    """

    def __init__(
        self,
        env: base.Env,
        randomizer: Callable[[System, jax.Array], System],
        rng: jax.Array,
        batch_size: int,
    ):
        super().__init__(env)
        self.batch_size = batch_size
        rngs = jax.random.split(rng, batch_size)
        self.sys_batch = randomize_system(env.unwrapped.sys, randomizer, rngs)

    def reset(self, rng) -> base.State:
        if rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)

        def reset_one(sys, r):
            inner = self.env.unwrapped
            orig = inner.sys
            try:
                inner.sys = sys
                return self.env.reset(r)
            finally:
                inner.sys = orig

        return jax.vmap(reset_one)(self.sys_batch, rng)

    def step(self, state: base.State, action) -> base.State:
        def step_one(sys, s, a):
            inner = self.env.unwrapped
            orig = inner.sys
            try:
                inner.sys = sys
                return self.env.step(s, a)
            finally:
                inner.sys = orig

        return jax.vmap(step_one)(self.sys_batch, state, action)
