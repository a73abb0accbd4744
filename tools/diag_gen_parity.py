"""Diagnose fused-generalized-kernel vs XLA-pipeline parity on TPU.

The r3 bench printed max|dq|=3e-2 after one ant env-step (5 frames) at
batch 1024 — far above the CPU interpret-mode parity (2e-5 after 2
frames).  This separates per-frame numerical difference (Mosaic
transcendentals / FMA contraction) from chaos amplification across frames,
and shows the distribution across envs rather than just the max.

Usage: python tools/diag_gen_parity.py [batch=256] [env=ant]
"""

import sys

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


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    env_name = sys.argv[2] if len(sys.argv) > 2 else "ant"
    env = _make_env(env_name)
    sysm = env.sys

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    state = jax.jit(jax.vmap(env.reset))(keys)
    ps0 = state.pipeline_state
    act = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (batch, env.action_size))

    def scan_path(n_frames):
        def one(s, a):
            def body(c, _):
                return pipeline.step(sysm, c, a), None

            return jax.lax.scan(body, s, (), n_frames)[0]

        return jax.jit(jax.vmap(one))

    for n_frames in (1, 5):
        kstep = jax.jit(gk.build_pipeline_step_fn(sysm, n_frames, batch))
        got = jax.block_until_ready(kstep(ps0, act))
        want = jax.block_until_ready(scan_path(n_frames)(ps0, act))
        for name in ("q", "qd"):
            d = onp.abs(onp.asarray(getattr(got, name) - getattr(want, name)))
            per_env = d.max(axis=1)
            print(
                f"n_frames={n_frames} {name}: median {onp.median(per_env):.2e}"
                f"  p99 {onp.percentile(per_env, 99):.2e}"
                f"  max {per_env.max():.2e}"
                f"  (argmax env {int(per_env.argmax())})",
                flush=True,
            )
        # contact state at the divergent env: is it a deep-penetration env?
        pen = onp.asarray(want.contact.penetration)
        worst = int(onp.abs(onp.asarray(got.q - want.q)).max(axis=1).argmax())
        print(
            f"  worst env penetrations: {pen[worst].round(4).tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
