"""PPO-ant wall-clock-to-solve (BASELINE target: PPO solves ant < 60 s).

Runs the tuned ant preset (braxlines/defaults.py, the reference's published
sweep shape) with frequent evals and reports the wall-clock at which the
eval reward first crosses the solve threshold, both including and excluding
the one-off jit compile (the tunnel-remote compile here is paid once per
program shape and is not a steady-state training cost).

Usage: python tools/time_to_solve.py [threshold=6000] [num_timesteps=20000000]
Prints one RESULT json line.
"""

import json
import logging
import sys
import time

# surface brax_tpu.aot hit/miss/fallback + cold-start milestones in the logs
logging.basicConfig(level=logging.WARNING)
logging.getLogger("brax_tpu.aot").setLevel(logging.INFO)
logging.getLogger("brax_tpu.training.ppo").setLevel(logging.INFO)

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402


def main():
    threshold = float(sys.argv[1]) if len(sys.argv) > 1 else 6000.0
    num_timesteps = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000_000

    from brax_tpu.compilation_cache import enable_compilation_cache

    cache = enable_compilation_cache()
    print(f"compilation cache: {cache}", flush=True)

    from brax_tpu import envs
    from brax_tpu.braxlines.defaults import DEFAULT_PPO_PARAMS
    from brax_tpu.training.agents.ppo import train as ppo

    cfg = dict(DEFAULT_PPO_PARAMS["ant"])
    cfg["num_timesteps"] = num_timesteps
    cfg["num_evals"] = 40  # ~every 0.5M steps: tight solve-time resolution
    # warm restarts skip Python tracing (StableHLO AOT cache) on top of the
    # persistent XLA compile cache — production cold-start configuration
    cfg["aot_cache"] = True

    print(f"ppo ant to reward>={threshold} on {jax.devices()}", flush=True)

    # chip-handoff barrier: when the previous tenant process just exited,
    # the first BLOCKING device op waits for the server to tear its state
    # down (measured 45-85 s back-to-back, ~0 s on an idle chip).  That is
    # cluster scheduling, not framework cold start — time it separately and
    # start the solve clock at device-ready.
    import jax.numpy as jnp

    t_dev = time.time()
    # a full round-trip: compute on device AND fetch the result back — the
    # fetch (device->host) path is the one that blocks on server handoff
    assert float(jnp.ones(8).sum()) == 8.0
    device_ready_s = time.time() - t_dev
    print(f"device ready after {device_ready_s:.1f}s", flush=True)

    t0 = time.time()
    events = []

    def progress(step, metrics):
        r = float(metrics.get("eval/episode_reward", 0.0))
        events.append((int(step), r, time.time() - t0))
        print(f"  step {step}: reward {r:.1f} ({events[-1][2]:.1f}s)", flush=True)

    env = envs._envs["ant"]()
    print(f"env constructed ({time.time()-t0:.1f}s)", flush=True)
    ppo.train(environment=env, seed=0, progress_fn=progress, **cfg)

    # first eval event is pre-training (step 0) and its walltime is ~the jit
    # compile; solve times are reported against both zero and that point
    jit_s = events[0][2] if events else float("nan")
    solve = next((e for e in events if e[1] >= threshold), None)
    out = {
        "threshold": threshold,
        "device_ready_s": round(device_ready_s, 1),
        "time_to_jit_s": round(jit_s, 1),
        "solved": solve is not None,
        "solve_steps": solve[0] if solve else None,
        "solve_walltime_s": round(solve[2], 1) if solve else None,
        "solve_walltime_excl_jit_s": round(solve[2] - jit_s, 1) if solve else None,
        "final_reward": round(events[-1][1], 1) if events else None,
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
