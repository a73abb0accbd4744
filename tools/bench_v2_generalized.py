"""Benchmark the v2 generalized pipeline on TPU (batched env.step).

Usage: python tools/bench_v2_generalized.py [batch] [steps] [env]
Reports env-steps/s for the full env.step (n_frames physics steps + obs +
reward) and for the bare physics pipeline.step.
"""

import sys
import time

import jax
import jax.numpy as jnp

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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    env_name = sys.argv[3] if len(sys.argv) > 3 else "ant"

    env = _make_env(env_name)
    sysm = env.sys

    rng = jax.random.PRNGKey(0)
    keys = jax.random.split(rng, batch)
    reset = jax.jit(jax.vmap(env.reset))
    t0 = time.perf_counter()
    state = jax.block_until_ready(reset(keys))
    print(f"reset jit+run: {time.perf_counter()-t0:.1f}s", flush=True)

    act = jnp.zeros((batch, env.action_size))

    # full env.step.  Warm up twice: a step-produced state can differ from the
    # reset-produced one in weak-type metadata, and the second compile must not
    # land inside the timing loop.
    step = jax.jit(jax.vmap(env.step))
    t0 = time.perf_counter()
    state2 = jax.block_until_ready(step(state, act))
    state2 = jax.block_until_ready(step(state2, act))
    print(f"env.step jit: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    s = state2
    for _ in range(steps):
        s = step(s, act)
    jax.block_until_ready(s)
    dt = time.perf_counter() - t0
    env_sps = batch * steps / dt
    print(f"env.step:      {env_sps:,.0f} env-steps/s  ({dt/steps*1e3:.2f} ms/step)")

    # bare physics step
    pstep = jax.jit(jax.vmap(pipeline.step, in_axes=(None, 0, 0)))
    ps = state.pipeline_state
    t0 = time.perf_counter()
    ps2 = jax.block_until_ready(pstep(sysm, ps, act))
    ps2 = jax.block_until_ready(pstep(sysm, ps2, act))
    print(f"pipeline.step jit: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    cur = ps2
    for _ in range(steps):
        cur = pstep(sysm, cur, act)
    jax.block_until_ready(cur)
    dt = time.perf_counter() - t0
    print(
        f"pipeline.step: {batch*steps/dt:,.0f} phys-steps/s  ({dt/steps*1e3:.2f} ms/step)"
    )

    # fused Pallas kernel: full env.step with kernel dispatch + bare kernel
    fused_sps = 0.0
    from brax_tpu.v2.generalized import kernels as gk

    if gk.supported(sysm) and batch % gk.LANE == 0:
        try:
            kstep = jax.jit(
                gk.build_pipeline_step_fn(sysm, env._n_frames, batch)
            )
            ps0 = state.pipeline_state
            t0 = time.perf_counter()
            kcur = jax.block_until_ready(kstep(ps0, act))
            print(f"fused kernel jit: {time.perf_counter()-t0:.1f}s", flush=True)
            # on-chip parity vs the XLA pipeline (one env-step)
            ref = jax.block_until_ready(
                jax.jit(jax.vmap(lambda s, a: _scan_frames(sysm, s, a, env._n_frames)))(
                    ps0, act
                )
            )
            dq = float(jnp.max(jnp.abs(kcur.q - ref.q)))
            dqd = float(jnp.max(jnp.abs(kcur.qd - ref.qd)))
            print(f"fused-vs-XLA parity (1 env-step): |dq|={dq:.2e} |dqd|={dqd:.2e}")
            # second warm-up on the step-produced state: its pytree metadata
            # differs from the reset-produced one, so the first loop call
            # would otherwise hide a full recompile inside the timing
            kcur = jax.block_until_ready(kstep(kcur, act))
            t0 = time.perf_counter()
            for _ in range(steps):
                kcur = kstep(kcur, act)
            jax.block_until_ready(kcur)
            dt = time.perf_counter() - t0
            print(
                f"fused kernel:  {batch*steps/dt:,.0f} env-steps/s"
                f"  ({dt/steps*1e3:.2f} ms/step)"
            )

            gk.enable(True)
            estep = jax.jit(jax.vmap(env.step))
            t0 = time.perf_counter()
            s2 = jax.block_until_ready(estep(state, act))
            s2 = jax.block_until_ready(estep(s2, act))
            print(f"fused env.step jit: {time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            cur = s2
            for _ in range(steps):
                cur = estep(cur, act)
            jax.block_until_ready(cur)
            dt = time.perf_counter() - t0
            fused_sps = batch * steps / dt
            print(
                f"fused env.step: {fused_sps:,.0f} env-steps/s"
                f"  ({dt/steps*1e3:.2f} ms/step)"
            )

            # scanned rollout: `steps` chained env.steps inside ONE jitted
            # program — the trainer-shaped measurement (rollouts run under
            # lax.scan there), free of per-call host dispatch latency
            @jax.jit
            def rollout(s0):
                def body(c, _):
                    return jax.vmap(env.step)(c, act), None

                return jax.lax.scan(body, s0, (), steps)[0]

            t0 = time.perf_counter()
            jax.block_until_ready(rollout(s2))
            print(f"fused rollout jit: {time.perf_counter()-t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            jax.block_until_ready(rollout(s2))
            dt = time.perf_counter() - t0
            fused_scan_sps = batch * steps / dt
            print(
                f"fused env.step (scanned): {fused_scan_sps:,.0f} env-steps/s"
                f"  ({dt/steps*1e3:.2f} ms/step)"
            )
            fused_sps = max(fused_sps, fused_scan_sps)
            gk.enable(False)

            # sublane-tile sweep: larger tiles trade VMEM for ILP in the
            # kernel's serial NS/FISTA chains (see build_pipeline_step_fn)
            n_rows = batch // gk.LANE
            for sub in (16, 32):
                if n_rows % sub:
                    continue
                try:
                    kstep_s = jax.jit(
                        gk.build_pipeline_step_fn(
                            sysm, env._n_frames, batch, sub=sub
                        )
                    )
                    t0 = time.perf_counter()
                    c = jax.block_until_ready(kstep_s(ps0, act))
                    print(f"sub={sub} jit: {time.perf_counter()-t0:.1f}s", flush=True)
                    c = jax.block_until_ready(kstep_s(c, act))
                    t0 = time.perf_counter()
                    for _ in range(steps):
                        c = kstep_s(c, act)
                    jax.block_until_ready(c)
                    dt = time.perf_counter() - t0
                    print(
                        f"sub={sub} fused kernel: {batch*steps/dt:,.0f}"
                        f" env-steps/s  ({dt/steps*1e3:.2f} ms/step)"
                    )
                except Exception as e:  # noqa: BLE001 - VMEM overflow etc
                    print(f"sub={sub} failed: {type(e).__name__}: {e}")
        except Exception as e:  # noqa: BLE001 - report, keep the XLA numbers
            print(f"fused kernel failed: {type(e).__name__}: {e}")
    print(
        f'RESULT {{"env": "{env_name}", "env_steps_per_sec": {env_sps:.0f}, '
        f'"fused_env_steps_per_sec": {fused_sps:.0f}, "batch": {batch}}}'
    )


def _scan_frames(sysm, s, a, n_frames):
    def body(c, _):
        return pipeline.step(sysm, c, a), None

    return jax.lax.scan(body, s, (), n_frames)[0]


if __name__ == "__main__":
    main()
