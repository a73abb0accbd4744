"""Can jax.export round-trip our fused-kernel programs? (AOT warm start)

Phase 1 (no argument): trace+lower+export env.step (v1 ant, fused Pallas
physics, batch 512), serialize to /tmp/aot_probe.bin, then call it.
Phase 2 (argument "warm"): deserialize and call WITHOUT any tracing —
the cold-start path a production launcher would take.

Usage: python tools/probe_aot_export.py [warm]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from brax_tpu.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp
from jax import export as jexport

from brax_tpu.envs import create
from brax_tpu.sim import kernels

PATH = "/tmp/aot_probe.bin"
BATCH = 512

kernels.enable(True)

t0 = time.perf_counter()
env = create("ant", auto_reset=True, batch_size=BATCH, episode_length=1000)
print(f"env construction: {time.perf_counter()-t0:.1f}s", flush=True)

rng = jax.random.PRNGKey(0)
state = jax.jit(env.reset)(rng)  # need a concrete state either way
act = jnp.zeros((BATCH, env.action_size))

flat, treedef = jax.tree_util.tree_flatten((state, act))


def flat_step(*leaves):
    s, a = jax.tree_util.tree_unflatten(treedef, leaves)
    out = env.step(s, a)
    return tuple(jax.tree_util.tree_leaves(out))


if len(sys.argv) > 1 and sys.argv[1] == "warm":
    t0 = time.perf_counter()
    with open(PATH, "rb") as f:
        exp = jexport.deserialize(bytearray(f.read()))
    t1 = time.perf_counter()
    out = exp.call(*flat)
    jax.block_until_ready(out)
    t2 = time.perf_counter()
    out = exp.call(*flat)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    print(
        f"warm: deserialize {t1-t0:.1f}s  first-call {t2-t1:.1f}s  "
        f"steady-call {t3-t2:.3f}s",
        flush=True,
    )
else:
    t0 = time.perf_counter()
    exp = jexport.export(jax.jit(flat_step))(*flat)
    t1 = time.perf_counter()
    data = exp.serialize()
    with open(PATH, "wb") as f:
        f.write(data)
    t2 = time.perf_counter()
    out = exp.call(*flat)
    jax.block_until_ready(out)
    t3 = time.perf_counter()
    print(
        f"cold: export(trace+lower) {t1-t0:.1f}s  serialize {t2-t1:.1f}s "
        f"({len(data)/1e6:.1f} MB)  first-call {t3-t2:.1f}s",
        flush=True,
    )
