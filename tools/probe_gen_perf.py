"""Decompose the fused generalized kernel's per-step cost on the chip.

Three scanned rollouts (all inside ONE jitted program, so host dispatch is
out of the picture), 100 steps each:
  a) fused env.step           — physics kernel + obs/reward + relayouts
  b) kernel step (State API)  — physics kernel + per-step (B,..)<->tile relayout
  c) tiled chain              — physics kernel only, state carried in tile layout
(b - c) is the per-step relayout cost; (a - b) is obs/reward; (c) is the
kernel body.  Then a sublane-tile sweep on (c) probes ILP headroom in the
kernel's serial NS/FISTA chains.

Usage: python tools/probe_gen_perf.py [env=ant] [batches=1024,4096]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from brax_tpu.compilation_cache import enable_compilation_cache

enable_compilation_cache()

from brax_tpu.v2.generalized import kernels as gk  # noqa: E402


def _make_env(name):
    from brax_tpu.v2.envs import ant, halfcheetah, humanoid

    return {"ant": ant.Ant, "halfcheetah": halfcheetah.Halfcheetah,
            "humanoid": humanoid.Humanoid}[name](backend="generalized")


STEPS = 100


def _time(fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    jit_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    return jit_s, time.perf_counter() - t0, out


def main():
    env_name = sys.argv[1] if len(sys.argv) > 1 else "ant"
    batches = [int(b) for b in (sys.argv[2] if len(sys.argv) > 2 else "1024,4096").split(",")]
    env = _make_env(env_name)
    sysm = env.sys

    for batch in batches:
        print(f"--- {env_name} @ {batch} ---", flush=True)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        state = jax.block_until_ready(jax.jit(jax.vmap(env.reset))(keys))
        ps0 = state.pipeline_state
        act = jnp.zeros((batch, env.action_size))

        # a) fused env.step rollout
        gk.enable(True)

        @jax.jit
        def roll_env(s0):
            def body(c, _):
                return jax.vmap(env.step)(c, act), None

            return jax.lax.scan(body, s0, (), STEPS)[0]

        jit_s, dt, _ = _time(roll_env, state)
        gk.enable(False)
        print(f"  env.step rollout: {batch*STEPS/dt:,.0f} env-steps/s "
              f"({dt/STEPS*1e3:.2f} ms/step, jit {jit_s:.0f}s)", flush=True)

        # b) kernel State-API rollout (per-step relayout)
        kstep = gk.build_pipeline_step_fn(sysm, env._n_frames, batch)

        @jax.jit
        def roll_k(s0):
            def body(c, _):
                return kstep(c, act), None

            return jax.lax.scan(body, s0, (), STEPS)[0]

        jit_s, dt, _ = _time(roll_k, ps0)
        print(f"  kernel rollout:   {batch*STEPS/dt:,.0f} env-steps/s "
              f"({dt/STEPS*1e3:.2f} ms/step, jit {jit_s:.0f}s)", flush=True)

        # c) tiled-space chain, sublane sweep
        n_rows = batch // gk.LANE
        for sub in (8, 16, 32):
            if n_rows % sub:
                continue
            step_t, _schema = gk.build_tiled_chain_fn(
                sysm, env._n_frames, batch, sub=sub
            )

            def to_tile(x):
                lead = tuple(range(1, x.ndim))
                return jnp.transpose(x, lead + (0,)).reshape(
                    x.shape[1:] + (n_rows, gk.LANE)
                )

            q_t = to_tile(ps0.q)
            qd_t = to_tile(ps0.qd)
            minv_t = to_tile(ps0.mass_mx_inv)
            act_t = to_tile(act)

            @jax.jit
            def roll_t(carry, _act_t=act_t, _step_t=step_t):
                def body(c, _):
                    return _step_t(c, _act_t)[0], None

                return jax.lax.scan(body, carry, (), STEPS)[0]

            try:
                jit_s, dt, _ = _time(roll_t, (q_t, qd_t, minv_t))
                print(f"  tiled chain sub={sub}: {batch*STEPS/dt:,.0f} env-steps/s "
                      f"({dt/STEPS*1e3:.2f} ms/step, jit {jit_s:.0f}s)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  tiled chain sub={sub} failed: {type(e).__name__}: {e}",
                      flush=True)


if __name__ == "__main__":
    main()
