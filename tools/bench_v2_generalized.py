"""Benchmark the v2 generalized pipeline on TPU.

All timings are SCANNED rollouts — `steps` chained env.steps inside ONE
jitted program, the shape rollouts take inside the trainers (lax.scan in
acting.generate_unroll).  Per-call python loops are NOT measured: over the
tunnel-remote chip each dispatch costs ~1-3 ms of launch latency, which
buried the kernel in earlier captures (r3 logged 700k env-steps/s @1024
for what is really a 2.4M env-steps/s program — see
HW_r04/probe_gen_perf_ant.log).

Usage: python tools/bench_v2_generalized.py [batch] [steps] [env]
Reports env-steps/s for the full env.step (n_frames physics steps + obs +
reward) on the XLA path and the fused-Pallas-kernel path, plus the bare
tiled-space kernel chain, and the fused-vs-XLA numerics distribution.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.v2.generalized import pipeline


def _make_env(name: str):
    from brax_tpu.v2.envs import ant, halfcheetah, humanoid, inverted_pendulum

    cls = {
        "ant": ant.Ant,
        "halfcheetah": halfcheetah.Halfcheetah,
        "humanoid": humanoid.Humanoid,
        "inverted_pendulum": inverted_pendulum.InvertedPendulum,
    }[name]
    return cls(backend="generalized")


def _timed_rollout(label, fn, s0, batch, steps):
    """jit-compiles fn, runs it twice, reports the second (steady) run."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(s0))
    print(f"{label} jit+run: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(s0))
    dt = time.perf_counter() - t0
    sps = batch * steps / dt
    print(f"{label}: {sps:,.0f} env-steps/s  ({dt/steps*1e3:.2f} ms/step)",
          flush=True)
    return sps, out


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    env_name = sys.argv[3] if len(sys.argv) > 3 else "ant"

    from brax_tpu.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    env = _make_env(env_name)
    sysm = env.sys

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, batch)
    t0 = time.perf_counter()
    state = jax.block_until_ready(jax.jit(jax.vmap(env.reset))(keys))
    print(f"reset jit+run: {time.perf_counter()-t0:.1f}s", flush=True)
    act = jnp.zeros((batch, env.action_size))

    def rollout(step_one):
        @jax.jit
        def run(s0):
            def body(c, _):
                return step_one(c), None

            return jax.lax.scan(body, s0, (), steps)[0]

        return run

    # XLA env.step path
    env_sps, _ = _timed_rollout(
        "env.step (XLA, scanned)",
        rollout(lambda s: jax.vmap(env.step)(s, act)),
        state, batch, steps,
    )

    # fused Pallas kernel paths
    fused_sps = tiled_sps = 0.0
    from brax_tpu.v2.generalized import kernels as gk

    if gk.supported(sysm) and batch % gk.LANE == 0:
        try:
            gk.enable(True)
            fused_sps, _ = _timed_rollout(
                "env.step (fused, scanned)",
                rollout(lambda s: jax.vmap(env.step)(s, act)),
                state, batch, steps,
            )
            gk.enable(False)

            # numerics: one env-step, fused vs XLA, per-env distribution.
            # The max alone is misleading: contact-solve conditioning
            # amplifies platform round-off, and the XLA:TPU path itself
            # diverges from XLA:CPU by the same magnitude (triangle
            # measurement: tools/diag_gen_kernel_hw.py, HW_r04)
            ps0 = state.pipeline_state
            kstep = jax.jit(gk.build_pipeline_step_fn(sysm, env._n_frames, batch))
            kout = jax.block_until_ready(kstep(ps0, act))
            ref = jax.block_until_ready(
                jax.jit(jax.vmap(lambda s, a: _scan_frames(sysm, s, a, env._n_frames)))(
                    ps0, act
                )
            )
            for name in ("q", "qd"):
                d = onp.abs(
                    onp.asarray(getattr(kout, name) - getattr(ref, name))
                ).max(axis=1)
                print(
                    f"fused-vs-XLA |d{name}| per-env: med {onp.median(d):.2e} "
                    f"p99 {onp.percentile(d, 99):.2e} max {d.max():.2e}",
                    flush=True,
                )

            # bare tiled-space kernel chain: physics only, no relayout
            n_rows = batch // gk.LANE
            step_t, _schema = gk.build_tiled_chain_fn(sysm, env._n_frames, batch)

            def to_tile(x):
                lead = tuple(range(1, x.ndim))
                return jnp.transpose(x, lead + (0,)).reshape(
                    x.shape[1:] + (n_rows, gk.LANE)
                )

            carry0 = (to_tile(ps0.q), to_tile(ps0.qd), to_tile(ps0.mass_mx_inv))
            act_t = to_tile(act)

            @jax.jit
            def run_t(c0):
                def body(c, _):
                    return step_t(c, act_t)[0], None

                return jax.lax.scan(body, c0, (), steps)[0]

            tiled_sps, _ = _timed_rollout(
                "kernel chain (tiled)", run_t, carry0, batch, steps
            )
        except Exception as e:  # noqa: BLE001 - report, keep the XLA numbers
            print(f"fused kernel failed: {type(e).__name__}: {e}")
    print(
        f'RESULT {{"env": "{env_name}", "env_steps_per_sec": {env_sps:.0f}, '
        f'"fused_env_steps_per_sec": {fused_sps:.0f}, '
        f'"tiled_kernel_steps_per_sec": {tiled_sps:.0f}, "batch": {batch}}}'
    )


def _scan_frames(sysm, s, a, n_frames):
    def body(c, _):
        return pipeline.step(sysm, c, a), None

    return jax.lax.scan(body, s, (), n_frames)[0]


if __name__ == "__main__":
    main()
