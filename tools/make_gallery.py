"""Renders the docs/gallery demo artifacts (native C++ rasterizer).

  python tools/make_gallery.py [docs/gallery]

Rolls short random/zero-action trajectories through a spread of scenes
(classic envs + composed multi-agent tasks) and saves PNG stills + one
animated GIF, exercising env stepping, the composer, tessellation, and
the native renderer end-to-end.
"""

import os
import sys

import jax
import jax.numpy as jnp


def rollout(env, n_frames, seed=0, scale=0.5):
    state = jax.jit(env.reset)(jax.random.PRNGKey(seed))
    step = jax.jit(env.step)
    qps = [state.qp]
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(n_frames - 1):
        key, k = jax.random.split(key)
        act = scale * jax.random.uniform(
            k, (env.action_size,), minval=-1, maxval=1
        )
        state = step(state, act)
        qps.append(state.qp)
    return qps


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "docs/gallery"
    os.makedirs(out, exist_ok=True)
    from brax_tpu.composer import envs as cenvs
    from brax_tpu.envs import ant as antm, humanoid as humm
    from brax_tpu.io import image

    def art_config(env):
        inner = env
        while hasattr(inner, "env"):
            inner = inner.env
        return inner.art.config if hasattr(inner, "art") else inner.sys.config

    # ant gif (the headline env)
    env = antm.Ant()
    qps = rollout(env, 24, scale=0.8)
    with open(f"{out}/ant.gif", "wb") as f:
        f.write(image.render(env.art.config, qps, 240, 180, fmt="gif"))

    # humanoid still
    env = humm.Humanoid()
    qps = rollout(env, 4, scale=0.3)
    with open(f"{out}/humanoid.png", "wb") as f:
        f.write(image.render(env.art.config, qps[-1:], 240, 180))

    # composed scenes
    for task, kw in [("chase", dict(num_agents=3)), ("ant_push", {}),
                     ("pro_ant_run", dict(num_legs=6))]:
        env = cenvs.create_env(task, episode_length=32, auto_reset=False, **kw)
        qps = rollout(env, 10, scale=0.6)
        name = task if not kw else f"{task}_{list(kw.values())[0]}"
        with open(f"{out}/{name}.png", "wb") as f:
            f.write(image.render(art_config(env), qps[-1:], 240, 180))
        print("wrote", name, flush=True)
    print("gallery at", out)


if __name__ == "__main__":
    main()
