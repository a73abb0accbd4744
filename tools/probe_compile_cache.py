"""Break down cold-start cost: trace+lower vs XLA/Mosaic compile vs run.

Run twice in separate processes: if the persistent compilation cache is
effective on this platform the second run's compile() should be near-zero
while trace+lower stays (Python tracing re-runs every process and no
executable cache can remove it).

Usage: python tools/probe_compile_cache.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from brax_tpu.compilation_cache import enable_compilation_cache

cache = enable_compilation_cache()
print(f"cache dir: {cache}", flush=True)

import jax
import jax.numpy as jnp

from brax_tpu.envs import create
from brax_tpu.sim import kernels

kernels.enable(True)
env = create("ant", auto_reset=True, batch_size=512, episode_length=1000)

rng = jax.random.PRNGKey(0)

t0 = time.perf_counter()
lowered = jax.jit(env.reset).lower(rng)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
state = jax.block_until_ready(compiled(rng))
t3 = time.perf_counter()
print(
    f"reset: trace+lower {t1-t0:.1f}s  compile {t2-t1:.1f}s  run {t3-t2:.1f}s",
    flush=True,
)

act = jnp.zeros((512, env.action_size))
t0 = time.perf_counter()
lowered = jax.jit(env.step).lower(state, act)
t1 = time.perf_counter()
compiled = lowered.compile()
t2 = time.perf_counter()
state = jax.block_until_ready(compiled(state, act))
t3 = time.perf_counter()
print(
    f"env.step: trace+lower {t1-t0:.1f}s  compile {t2-t1:.1f}s  run {t3-t2:.1f}s",
    flush=True,
)
