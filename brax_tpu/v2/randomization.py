"""Domain randomization over v2 Systems.

The v2 System is a flax.struct pytree, so randomizing physics parameters is
a pure rng -> System map vmapped over a key batch; pipelines take the System
as an explicit argument, so the batched population threads straight through
`pipeline.step`.  Role parity: the v1 module (brax_tpu/sim/randomization.py)
and /root/reference/brax/experimental/tracing/{customize,randomizers}.py.

Note: a randomized (traced) System never dispatches to the fused Pallas
kernel — kernel plans bake parameters into code; `kernels.supported()`
rejects traced leaves and the scan path runs instead.
"""

from __future__ import annotations

from typing import Callable

import jax

from brax_tpu.v2.base import System
from brax_tpu.v2.envs import env as v2_env


def randomize_system(
    sys: System, randomizer: Callable[[System, jax.Array], System], rngs
) -> System:
    """Returns a System whose perturbed leaves carry a leading batch axis."""
    return jax.vmap(lambda r: randomizer(sys, r))(rngs)


def friction_randomizer(scale_low: float = 0.5, scale_high: float = 1.5):
    """Scales contact friction on every geom (colliding pairs included)."""

    def randomize(sys: System, rng: jax.Array) -> System:
        scale = jax.random.uniform(rng, (), minval=scale_low, maxval=scale_high)
        geoms = [g.replace(friction=g.friction * scale) for g in sys.geoms]
        contacts = [
            (ga.replace(friction=ga.friction * scale),
             gb.replace(friction=gb.friction * scale))
            for ga, gb in sys.contacts
        ]
        return sys.replace(geoms=geoms, contacts=contacts)

    return randomize


def mass_randomizer(scale_low: float = 0.8, scale_high: float = 1.2):
    """Scales per-link mass + rotational inertia (invweights to match)."""

    def randomize(sys: System, rng: jax.Array) -> System:
        n = sys.num_links()
        scale = jax.random.uniform(rng, (n,), minval=scale_low, maxval=scale_high)
        inertia = sys.link.inertia.replace(
            mass=sys.link.inertia.mass * scale,
            i=sys.link.inertia.i * scale[:, None, None],
        )
        link = sys.link.replace(
            inertia=inertia, invweight=sys.link.invweight / scale
        )
        return sys.replace(link=link)

    return randomize


def gear_randomizer(scale_low: float = 0.9, scale_high: float = 1.1):
    """Scales actuator gear (motor strength)."""

    def randomize(sys: System, rng: jax.Array) -> System:
        n = sys.act_size()
        scale = jax.random.uniform(rng, (n,), minval=scale_low, maxval=scale_high)
        return sys.replace(actuator=sys.actuator.replace(gear=sys.actuator.gear * scale))

    return randomize


def gravity_randomizer(scale_low: float = 0.9, scale_high: float = 1.1):
    """Scales gravity."""

    def randomize(sys: System, rng: jax.Array) -> System:
        scale = jax.random.uniform(rng, (), minval=scale_low, maxval=scale_high)
        return sys.replace(gravity=sys.gravity * scale)

    return randomize


class DomainRandomizationWrapper(v2_env.Wrapper):
    """Batches a v2 env over a randomized System population.

    Each batch element steps its own perturbed physics; reset keys may be a
    single key (split internally) or one per population member.
    """

    def __init__(
        self,
        env: v2_env.Env,
        randomizer: Callable[[System, jax.Array], System],
        rng: jax.Array,
        batch_size: int,
    ):
        super().__init__(env)
        self.batch_size = batch_size
        rngs = jax.random.split(rng, batch_size)
        self.sys_batch = randomize_system(env.unwrapped.sys, randomizer, rngs)

    def _with_sys(self, fn, sys, *args):
        inner = self.env.unwrapped
        orig = inner.sys
        try:
            inner.sys = sys
            return fn(*args)
        finally:
            inner.sys = orig

    def reset(self, rng) -> v2_env.State:
        if rng.ndim == 1:
            rng = jax.random.split(rng, self.batch_size)
        return jax.vmap(
            lambda sys, r: self._with_sys(self.env.reset, sys, r)
        )(self.sys_batch, rng)

    def step(self, state: v2_env.State, action) -> v2_env.State:
        return jax.vmap(
            lambda sys, s, a: self._with_sys(self.env.step, sys, s, a)
        )(self.sys_batch, state, action)
