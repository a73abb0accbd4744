"""Roofline the fused v2 generalized kernel (VERDICT r4 item 2).

Algorithmic flops per env.step are assembled from XLA cost analysis of the
UNFUSED jnp path with scan-body corrections (HLO cost analysis counts
while-loop bodies once):

  env_true = (env_once - pipe_once) + n_frames * pipe_true
  pipe_true = pipe_once + (iters - 1) * fista_body
  fista_body = cost(fista unrolled x2) - cost(fista unrolled x1)

The roof is the VPU (the kernel vectorizes per-env small-matrix algebra
across lanes; there are no cross-env contractions for the MXU), measured
by bench.py's FMA microbenchmark.  Rates are scanned warm rollouts
(trainer-shaped) on the chip: ant@4096, humanoid@1024.

Prints RESULT json; log under HW_r05/.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from brax_tpu.compilation_cache import enable_compilation_cache


def _cost_flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    c = c[0] if isinstance(c, (list, tuple)) else c
    return float(c["flops"])


def algorithmic_flops_per_env_step(env_name: str, n: int = 8) -> dict:
    """Scan-corrected flops of the unfused generalized env.step, per env."""
    from brax_tpu.v2.envs import create as v2_create
    from brax_tpu.v2.generalized import constraint as gcon
    from brax_tpu.v2.generalized import kernels as gk
    from brax_tpu.v2.generalized import pipeline as gpipe

    prev = gk.enabled()
    gk.enable(False)
    try:
        env = v2_create(env_name, backend="generalized")
        sys_ = env.unwrapped.sys if hasattr(env, "unwrapped") else env.sys
        iters = int(sys_.solver_iterations)
        n_frames = env.unwrapped._n_frames

        rng = jax.random.split(jax.random.PRNGKey(0), n)
        state = jax.jit(jax.vmap(env.reset))(rng)
        act = jnp.zeros((n, env.action_size))
        env_once = _cost_flops(jax.vmap(env.step), state, act) / n

        ps = state.pipeline_state
        pipe_once = _cost_flops(
            jax.vmap(lambda s, a: gpipe.step(sys_, s, a)), ps, act
        ) / n

        # FISTA body via unrolled diff on representative (a, b) shapes
        nr, nd = None, None
        from brax_tpu.v2.generalized.kernels import _Plan

        p = _Plan(sys_)
        nr, nd = p.nr, p.nd
        a = jnp.ones((n, nr, nd))
        b = jnp.ones((n, nr))

        def fista_unrolled(k):
            def f(a, b):
                return gcon._fista_nnls(a @ a.T, b, maxiter=k)

            return _cost_flops(jax.vmap(f), a, b) / n

        fista_diff = max(fista_unrolled(2) - fista_unrolled(1), 0.0)
        # per iteration: grad (2 matvecs) + maxls=5 objective evals — the
        # scan-unroll diff underestimates when XLA keeps the inner scan (ant
        # measured 220 vs 8.4k analytic; humanoid 60.1k ~= 60.3k analytic),
        # so take the larger of the two
        fista_analytic = (2 * 2 * nr * nr) + 5 * (2 * nr * nr + 3 * nr)
        fista_body = max(fista_diff, float(fista_analytic))

        pipe_true = pipe_once + (iters - 1) * fista_body
        env_true = (env_once - pipe_once) + n_frames * pipe_true
        return {
            "env_once": env_once,
            "pipe_once": pipe_once,
            "fista_body": fista_body,
            "iters": iters,
            "n_frames": n_frames,
            "flops_per_env_step": env_true,
            "nr": nr,
            "nd": nd,
        }
    finally:
        gk.enable(prev)


def measured_rate(env_name: str, num_envs: int, num_steps: int = 100) -> float:
    """Warm scanned-rollout env-steps/s with the fused kernel."""
    from brax_tpu.v2.envs import create as v2_create
    from brax_tpu.v2.envs import wrappers as v2_wrappers
    from brax_tpu.v2.generalized import kernels as gk

    gk.enable(True)
    env = v2_create(env_name, backend="generalized")
    env = v2_wrappers.VmapWrapper(v2_wrappers.EpisodeWrapper(env, 1000, 1))
    rng = jax.random.split(jax.random.PRNGKey(0), num_envs)
    state = jax.jit(env.reset)(rng)

    @jax.jit
    def rollout(state, key):
        def step(carry, _):
            s, k = carry
            k, kk = jax.random.split(k)
            act = jax.random.uniform(
                kk, (num_envs, env.action_size), minval=-1.0, maxval=1.0
            )
            return (env.step(s, act), k), ()

        (s, _), _ = jax.lax.scan(step, (state, key), (), length=num_steps)
        return s

    key = jax.random.PRNGKey(1)
    state = rollout(state, key)
    state = rollout(state, jax.random.fold_in(key, 1))
    # scalar host fetch: block_until_ready is not a reliable fence for
    # small buffers over the tunneled TPU (see bench.py _slope_time)
    float(jnp.sum(state.pipeline_state.q))
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        state = rollout(state, jax.random.fold_in(key, 2 + i))
    float(jnp.sum(state.pipeline_state.q))
    return num_envs * num_steps * iters / (time.perf_counter() - t0)


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0
    import bench  # VPU peak microbenchmark

    vpu_peak = bench._measure_vpu_peak_flops()
    out = {"vpu_peak_tflops": round(vpu_peak / 1e12, 2)}
    for name, nenv in (("ant", 4096), ("humanoid", 1024)):
        f = algorithmic_flops_per_env_step(name)
        rate = measured_rate(name, nenv)
        mfu = rate * f["flops_per_env_step"] / vpu_peak
        sol = vpu_peak / f["flops_per_env_step"]
        out[f"gen_{name}"] = {
            "num_envs": nenv,
            "env_steps_per_s": round(rate),
            "flops_per_env_step": round(f["flops_per_env_step"]),
            "mfu": round(mfu, 4),
            "pct_of_speed_of_light": round(100 * rate / sol, 1),
            "detail": {k: round(v) if isinstance(v, float) else v
                       for k, v in f.items()},
        }
        print(json.dumps(out[f"gen_{name}"]), flush=True)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
