"""Measure 1000-step statistical-parity gaps vs the reference for the
contact-heavy envs (VERDICT r4 item 5): grasp, fetch, humanoid (+ant as
control).  Prints per-env ref/mine stats and relative gaps; the test
tolerances in tests/test_bitexact_bounds.py are pinned at ~4x these.

Usage: python tools/measure_stat_parity.py [nenv=256] [nstep=1000] [envs...]
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from tests import reference

assert reference.setup()


def _ref_humanoid():
    """The reference's humanoid_new crashes in __init__ (KeyError 'Target',
    humanoid_new.py:214/1026) — bypass it like tests/test_env_suite_parity."""
    from brax.envs import humanoid_new as ref_mod
    import brax.envs.env as ref_env_base

    env = object.__new__(ref_mod.Humanoid)
    ref_env_base.Env.__init__(env, config=ref_mod._SYSTEM_CONFIG)
    env._forward_reward_weight = 1.25
    env._ctrl_cost_weight = 0.1
    env._healthy_reward = 5.0
    env._terminate_when_unhealthy = True
    env._healthy_z_range = (1.1, 2.0)
    env._reset_noise_scale = 1e-2
    env._exclude_current_positions_from_observation = True
    return env


def run_stats(create, env_name, nenv, nstep, chunk=250, ref_side=False):
    if env_name == "humanoid" and ref_side:
        from brax.envs import wrappers as ref_wrappers

        env = _ref_humanoid()
        env = ref_wrappers.EpisodeWrapper(env, 1000, 1)
        env = ref_wrappers.VectorWrapper(env, nenv)
        env = ref_wrappers.AutoResetWrapper(env)
    else:
        env = create(env_name, episode_length=1000, auto_reset=True, batch_size=nenv)
    act_size = env.action_size
    rng = jax.random.PRNGKey(0)
    try:
        state = jax.jit(env.reset)(rng)
    except Exception:  # noqa: BLE001
        state = jax.jit(env.reset)(jax.random.split(rng, nenv))

    @jax.jit
    def run_chunk(state, base):
        def body(s, i):
            k = jax.random.fold_in(jax.random.PRNGKey(123), base * chunk + i)
            a = jax.random.uniform(k, (nenv, act_size), minval=-1.0, maxval=1.0)
            s = env.step(s, a)
            return s, (s.reward, s.done, s.qp.pos[:, 0, 2])

        return jax.lax.scan(body, state, jnp.arange(chunk))

    rews, dones, zs = [], [], []
    for b in range(nstep // chunk):
        state, (r, d, z) = run_chunk(state, jnp.asarray(b))
        rews.append(np.asarray(r))
        dones.append(np.asarray(d))
        zs.append(np.asarray(z))
    r, d, z = map(np.concatenate, (rews, dones, zs))
    return {
        "reward_mean": float(r.mean()),
        "reward_std": float(r.std()),
        "done_frac": float(d.mean()),
        "z_mean": float(z.mean()),
        "z_std": float(z.std()),
    }


def main():
    nenv = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    nstep = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    env_names = sys.argv[3:] or ["grasp", "fetch", "humanoid", "ant"]

    from brax.envs import create as ref_create

    from brax_tpu.envs import create as my_create

    import time

    for name in env_names:
        t0 = time.time()
        ref = run_stats(ref_create, name, nenv, nstep, ref_side=True)
        mine = run_stats(my_create, name, nenv, nstep)
        gaps = {}
        for k in ref:
            denom = max(abs(ref[k]), 1e-6)
            gaps[k] = round(abs(ref[k] - mine[k]) / denom, 5)
        print(
            f"ENV {name} ({time.time()-t0:.0f}s): "
            + json.dumps({"ref": ref, "mine": mine, "rel_gap": gaps}),
            flush=True,
        )


if __name__ == "__main__":
    main()
