"""Contact-heavy multi-agent composer bench (BASELINE config 5 testbed).

Builds an N-agent chase scene (ring scenery + per-pair contact edges) and
measures full env.step throughput at a large batch on the current backend.

  python tools/bench_composer.py [batch=16384] [steps=50] [num_agents=4]

Prints one RESULT json line.  Parity target: the reference's ma_descs
scenes (/root/reference/brax/experimental/composer/envs/ma_descs.py) which
BASELINE names as the many-body contact-heavy scaling testbed.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

# many-body scenes at 16k envs stream ~23 MB of kernel I/O blocks through
# scoped VMEM; XLA's TPU default cap is 16 MB (the r2 capture OOM'd at
# compile, HW_r02/composer_16384.log) while the chip has 128 MB.  Passed
# per-compile: the client-side CPU XLA aborts on unknown flags in
# XLA_FLAGS, so the env-var route is not available.
TPU_COMPILER_OPTS = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    num_agents = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    from brax_tpu.compilation_cache import enable_compilation_cache
    from brax_tpu.composer import envs as cenvs
    from brax_tpu.sim import kernels

    enable_compilation_cache()

    kernels.enable(True)  # fused Pallas physics on TPU (supported(sys)=True)

    env = cenvs.create_ma_env(
        task="chase",
        episode_length=1000,
        batch_size=batch,
        auto_reset=True,
        num_agents=num_agents,
    )
    print(f"scene: {num_agents}-agent chase, action_size={env.action_size}, "
          f"obs={env.observation_size}, batch={batch}", flush=True)

    rng = jax.random.PRNGKey(0)
    t0 = time.perf_counter()
    state = jax.block_until_ready(jax.jit(env.reset)(rng))
    print(f"reset jit+run: {time.perf_counter() - t0:.1f}s", flush=True)

    def rollout_fn(state, key):
        def body(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            act = jax.random.uniform(
                kk, (batch, env.action_size), minval=-1.0, maxval=1.0
            )
            return (env.step(s, act), k), ()

        return jax.lax.scan(body, (state, key), (), length=steps)[0][0]

    rollout = (
        jax.jit(rollout_fn)
        .lower(state, rng)
        .compile(compiler_options=TPU_COMPILER_OPTS)
    )
    t0 = time.perf_counter()
    state = jax.block_until_ready(rollout(state, rng))
    print(f"rollout jit+run: {time.perf_counter() - t0:.1f}s", flush=True)
    state = jax.block_until_ready(rollout(state, jax.random.fold_in(rng, 1)))

    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        state = rollout(state, jax.random.fold_in(rng, 2 + i))
    jax.block_until_ready(state)
    dt = time.perf_counter() - t0
    sps = batch * steps * iters / dt
    print("RESULT " + json.dumps({
        "metric": f"composer_chase{num_agents}_env_steps_per_s",
        "value": round(sps),
        "batch": batch,
        "unit": "env-steps/s",
    }))


if __name__ == "__main__":
    main()
