"""Sublane-tile sweep for the v1 fused PBD kernel.

The kernel's env layout packs each logical scalar row as (sub, 128) vreg
tiles; sub=8 (one vreg per op) is the default.  Wider tiles give the VPU
several independent vregs per instruction stream position, which can fill
dependency-stall slots in the step's long serial chains (joint projection,
contact resolution) — or lose to VMEM pressure.  This measures both as
scanned rollouts (the trainer-shaped program; per-call python loops pay
1-3 ms tunnel dispatch each, see tools/bench_v2_generalized.py).

Usage: python tools/bench_v1_sub_sweep.py [env=ant] [batch=4096] [steps=200]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from brax_tpu.compilation_cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 200

    from brax_tpu.envs import create
    from brax_tpu.sim import kernels

    env = create(env_name, auto_reset=True, batch_size=batch,
                 episode_length=1000)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(env.reset)(rng)
    act = jnp.zeros((batch, env.action_size))

    sys_obj = env.unwrapped.sys if hasattr(env.unwrapped, "sys") else env.sys
    n_rows = batch // 128

    results = {}
    for sub in (8, 16, 32):
        if n_rows % sub:
            continue
        step_fn = kernels.build_step_fn(sys_obj, batch, sub=sub)

        @jax.jit
        def roll(qp):
            def body(c, _):
                out, _info = step_fn(c, act)
                return out, None

            return jax.lax.scan(body, qp, (), steps)[0]

        qp0 = state.qp if hasattr(state, "qp") else state.pipeline_state
        t0 = time.perf_counter()
        jax.block_until_ready(roll(qp0))
        print(f"sub={sub}: jit+run {time.perf_counter()-t0:.1f}s", flush=True)
        t0 = time.perf_counter()
        jax.block_until_ready(roll(qp0))
        dt = time.perf_counter() - t0
        sps = batch * steps / dt
        results[sub] = sps
        print(f"sub={sub}: {sps:,.0f} env-steps/s ({dt/steps*1e3:.3f} ms/step)",
              flush=True)

    best = max(results, key=results.get)
    print(f"BEST sub={best}: {results[best]:,.0f} env-steps/s", flush=True)


if __name__ == "__main__":
    main()
