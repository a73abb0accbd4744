"""Fused-kernel compile-time measurement (VERDICT r1 item 8).

Times the cold jit of the fused Pallas whole-step kernel for ant in both
dynamics modes, rolled vs unrolled substeps.  Run on the TPU (Mosaic
compile is the thing being measured; the persistent compilation cache is
disabled for this process so timings are honest).

  python tools/bench_compile_time.py [batch=1024]
"""

import json
import os
import sys
import time

os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ["JAX_ENABLE_COMPILATION_CACHE"] = "false"

import jax
import jax.numpy as jnp


def time_compile(sys_, batch, roll):
    # route the kernel build through the roll override
    import brax_tpu.sim.kernels as K

    orig = K._build_tile_step
    K._build_tile_step = lambda s, roll_substeps=None: orig(s, roll)
    try:
        fn = K.build_step_fn(sys_, batch)
        rng = jax.random.PRNGKey(0)
        from brax_tpu.sim.types import QP

        nb = sys_.num_bodies
        qp = QP(
            pos=jnp.zeros((batch, nb, 3)).at[:, :, 2].set(1.0),
            rot=jnp.tile(jnp.array([1.0, 0, 0, 0]), (batch, nb, 1)),
            vel=jnp.zeros((batch, nb, 3)),
            ang=jnp.zeros((batch, nb, 3)),
        )
        act = jnp.zeros((batch, sys_.num_actuators))
        t0 = time.perf_counter()
        out = jax.block_until_ready(jax.jit(fn)(qp, act))
        return time.perf_counter() - t0
    finally:
        K._build_tile_step = orig


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    from brax_tpu.envs import ant as ant_mod

    results = {}
    for mode, env in (
        ("pbd", ant_mod.Ant(use_contact_forces=True)),
        ("spring", ant_mod.Ant(legacy_spring=True)),
    ):
        for roll in (True, False):
            key = f"{mode}_{'rolled' if roll else 'unrolled'}"
            try:
                dt = time_compile(env.sys, batch, roll)
                results[key] = round(dt, 1)
                print(f"{key}: {dt:.1f}s", flush=True)
            except Exception as e:  # noqa: BLE001
                results[key] = f"failed: {type(e).__name__}"
                print(f"{key}: FAILED {e}", flush=True)
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
