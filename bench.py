"""Headline benchmark: ant env-steps/s at 4096 envs on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline target (BASELINE.json): 10M env-steps/s per v5p host.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp


def main():
    from brax_tpu.envs import create
    from brax_tpu.sim import kernels

    # rollout is the measured path: use the fused Pallas physics kernel
    kernels.enable(True)

    num_envs = 4096
    num_steps = 200

    env = create("ant", episode_length=1000, auto_reset=True, batch_size=num_envs)

    rng = jax.random.PRNGKey(0)
    reset_keys = jax.random.split(rng, num_envs)

    @jax.jit
    def rollout(state, key):
        def step(carry, _):
            state, key = carry
            key, k = jax.random.split(key)
            act = jax.random.uniform(
                k, (num_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            state = env.step(state, act)
            return (state, key), ()

        (state, _), _ = jax.lax.scan(step, (state, key), (), length=num_steps)
        return state

    state = jax.jit(env.reset)(reset_keys)
    # warm up with the exact call pattern used in the timed loop: the second
    # compile (input = rollout output, whose device layouts can differ from
    # reset output) and the folded-key path must both be cached before timing
    state = rollout(state, rng)
    state = rollout(state, jax.random.fold_in(rng, 1001))
    state = rollout(state, jax.random.fold_in(rng, 1002))
    jax.block_until_ready(state.qp.pos)

    t = time.perf_counter()
    iters = 5
    for i in range(iters):
        state = rollout(state, jax.random.fold_in(rng, i))
    jax.block_until_ready(state.qp.pos)
    dt = time.perf_counter() - t

    sps = num_envs * num_steps * iters / dt
    baseline = 10_000_000.0
    print(
        json.dumps(
            {
                "metric": "ant_env_steps_per_s_4096envs",
                "value": round(sps),
                "unit": "env-steps/s",
                "vs_baseline": round(sps / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
