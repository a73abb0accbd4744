"""Fixture loading + benchmark harness for the v2 engine.

Role parity: reference brax/v2/test_utils.py.  `sample_mujoco_states` is not
reproducible here (no mujoco in this environment); fixtures are built-in MJCF
strings and the benchmark harness matches the reference shape (batch x steps,
jit time vs op time).
"""

from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from brax_tpu.v2 import mjcf
from brax_tpu.v2.base import System
from brax_tpu.v2.envs import assets

_FIXTURES = {
    "single_pendulum": """
<mujoco model="pendulum">
  <option gravity="0 0 -9.81" timestep="0.01"/>
  <worldbody>
    <body name="arm" pos="0 0 0">
      <joint axis="1 0 0" name="hinge" pos="0 0 0" type="hinge"/>
      <geom name="ball" pos="0 0.5 0" size="0.15" mass="1" type="sphere"/>
    </body>
  </worldbody>
</mujoco>
""",
    "triple_pendulum": """
<mujoco model="triple pendulum">
  <option gravity="0 0 -9.81" timestep="0.004"/>
  <worldbody>
    <body name="l1" pos="0 0 0">
      <joint axis="1 0 0" name="h1" type="hinge"/>
      <geom name="g1" pos="0 0.3 0" size="0.1" mass="1" type="sphere"/>
      <body name="l2" pos="0 0.6 0">
        <joint axis="1 0 0" name="h2" type="hinge"/>
        <geom name="g2" pos="0 0.3 0" size="0.1" mass="1" type="sphere"/>
        <body name="l3" pos="0 0.6 0">
          <joint axis="1 0 0" name="h3" type="hinge"/>
          <geom name="g3" pos="0 0.3 0" size="0.1" mass="1" type="sphere"/>
        </body>
      </body>
    </body>
  </worldbody>
</mujoco>
""",
    "capsule_drop": """
<mujoco model="drop">
  <option gravity="0 0 -9.81" timestep="0.004"/>
  <worldbody>
    <geom name="floor" pos="0 0 0" size="10 10 1" type="plane"/>
    <body name="cap" pos="0 0 0.5">
      <joint name="root" type="free"/>
      <geom name="c1" fromto="-0.3 0 0 0.3 0 0" size="0.1" type="capsule"/>
    </body>
  </worldbody>
</mujoco>
""",
}


def load_fixture(name: str) -> System:
    """Loads a named fixture ('single_pendulum', 'ant', ...)."""
    name = name.removesuffix(".xml")
    if name in _FIXTURES:
        return mjcf.loads(_FIXTURES[name])
    builder = getattr(assets, f"{name}_xml", None)
    if builder is None:
        raise KeyError(f"unknown fixture {name}")
    return mjcf.loads(builder())


def benchmark(
    name: str,
    init_fn: Callable,
    step_fn: Callable,
    batch_size: int = 256,
    length: int = 1000,
) -> Tuple[float, float]:
    """Times a batched pipeline rollout; returns (jit seconds, op seconds).

    Matches the reference harness shape (v2/test_utils.py:70+): vmapped init,
    lax.scan over `length` steps, one warm-up for compile.
    """
    sys = load_fixture(name)

    @jax.jit
    def run(seed):
        rngs = jax.random.split(jax.random.PRNGKey(seed), batch_size)
        init_state = jax.vmap(lambda rng: init_fn(sys, rng))(rngs)

        def step(states, _):
            states = jax.vmap(step_fn, in_axes=(None, 0, 0))(
                sys, states, jnp.zeros((batch_size, sys.act_size()))
            )
            return states, None

        return jax.lax.scan(step, init_state, (), length=length)[0]

    t = time.perf_counter()
    jax.block_until_ready(run(0))
    jit_time = time.perf_counter() - t

    t = time.perf_counter()
    jax.block_until_ready(run(1))
    op_time = time.perf_counter() - t
    return jit_time - op_time, op_time
