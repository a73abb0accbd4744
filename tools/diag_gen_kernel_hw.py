"""Two on-chip diagnostics for the fused generalized kernel.

1. Triangle parity: after one physics frame, compare
     A = fused Pallas kernel on TPU
     B = jnp/XLA pipeline on TPU
     C = jnp/XLA pipeline on CPU (float32, the portability oracle)
   If |A-B| ~ |B-C| then the kernel sits inside the platform numerics
   noise floor (Mosaic vs XLA:TPU vs XLA:CPU transcendental/fusion
   differences amplified by the NNLS solve's conditioning); if |A-B| >>
   |B-C| the kernel has a real numerical defect.

2. Standalone dispatch timing: the r3 bench measured the bare kernel at
   ~275 ms/call while the same kernel inside env.step ran at 1.5 ms/call.
   Times each call individually to separate recompiles (~40 s), per-call
   host dispatch overhead, and actual device time.

Usage: python tools/diag_gen_kernel_hw.py [batch=256] [env=ant]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as onp

sys.path.insert(0, "/root/repo")

from brax_tpu.v2.generalized import kernels as gk
from brax_tpu.v2.generalized import pipeline


def _make_env(name):
    from brax_tpu.v2.envs import ant, halfcheetah, humanoid

    return {"ant": ant.Ant, "halfcheetah": halfcheetah.Halfcheetah,
            "humanoid": humanoid.Humanoid}[name](backend="generalized")


def _stats(tag, a, b):
    for name in ("q", "qd"):
        d = onp.abs(onp.asarray(getattr(a, name)) - onp.asarray(getattr(b, name)))
        per_env = d.max(axis=1)
        print(
            f"  {tag} {name}: median {onp.median(per_env):.2e}"
            f"  p99 {onp.percentile(per_env, 99):.2e}  max {per_env.max():.2e}",
            flush=True,
        )


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    env_name = sys.argv[2] if len(sys.argv) > 2 else "ant"
    env = _make_env(env_name)
    sysm = env.sys

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state = jax.jit(jax.vmap(env.reset))(keys)
    ps0 = jax.block_until_ready(state.pipeline_state)
    act = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (batch, env.action_size))

    def one(s, a):
        return pipeline.step(sysm, s, a)

    # --- triangle parity, one frame ---
    kstep = jax.jit(gk.build_pipeline_step_fn(sysm, 1, batch))
    a_tpu = jax.block_until_ready(kstep(ps0, act))
    b_tpu = jax.block_until_ready(jax.jit(jax.vmap(one))(ps0, act))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ps0_c = jax.device_put(ps0, cpu)
        act_c = jax.device_put(act, cpu)
        c_cpu = jax.block_until_ready(jax.jit(jax.vmap(one))(ps0_c, act_c))
    print("triangle parity after 1 frame:", flush=True)
    _stats("kernel(TPU) vs XLA(TPU)", a_tpu, b_tpu)
    _stats("XLA(TPU)   vs XLA(CPU)", b_tpu, c_cpu)
    _stats("kernel(TPU) vs XLA(CPU)", a_tpu, c_cpu)

    # --- standalone timing anatomy ---
    print("per-call walltime (bare fused kernel, jit-cached):", flush=True)
    cur = a_tpu
    for i in range(8):
        t0 = time.perf_counter()
        cur = jax.block_until_ready(kstep(cur, act))
        print(f"  call {i}: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
    # async chain of 20 calls, one block at the end (the bench's shape)
    t0 = time.perf_counter()
    for _ in range(20):
        cur = kstep(cur, act)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0
    print(f"  async chain of 20: {dt/20*1e3:.1f} ms/call", flush=True)

    # same chain through jitted env.step (the fast path in the r3 bench)
    gk.enable(True)
    estep = jax.jit(jax.vmap(env.step))
    s = jax.block_until_ready(estep(state, act))
    s = jax.block_until_ready(estep(s, act))
    t0 = time.perf_counter()
    for _ in range(20):
        s = estep(s, act)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    print(f"  env.step async chain of 20: {dt/20*1e3:.1f} ms/call", flush=True)
    gk.enable(False)


if __name__ == "__main__":
    main()
