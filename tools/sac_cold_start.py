"""SAC-humanoid cold-start measurement (AOT + compile caches).

SAC is the big off-policy program: the shard_mapped training epoch embeds
the fused physics rollout, the on-device replay ring, and
grad_updates_per_step SGD steps — the longest trace in the codebase.  This
measures wall-clock to the first eval and to completion of a short run,
cold (first ever: traces + exports + compiles) vs warm (deserialize only).

Usage: python tools/sac_cold_start.py [num_timesteps=524288]
Prints one RESULT json line.
"""

import json
import logging
import sys
import time

sys.path.insert(0, "/root/repo")

logging.basicConfig(level=logging.WARNING)
logging.getLogger("brax_tpu.aot").setLevel(logging.INFO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main():
    num_timesteps = int(sys.argv[1]) if len(sys.argv) > 1 else 524288

    from brax_tpu.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    from brax_tpu import envs
    from brax_tpu.training.agents.sac import train as sac

    # device-ready barrier (see tools/time_to_solve.py: chip handoff can
    # block the first fetch for minutes after the previous tenant exits)
    t_dev = time.time()
    assert float(jnp.ones(8).sum()) == 8.0
    device_ready_s = time.time() - t_dev
    print(f"device ready after {device_ready_s:.1f}s", flush=True)

    t0 = time.time()
    events = []

    def progress(step, metrics):
        r = float(metrics.get("eval/episode_reward", 0.0))
        events.append((int(step), r, time.time() - t0))
        print(f"  step {step}: reward {r:.1f} ({events[-1][2]:.1f}s)", flush=True)

    env = envs._envs["humanoid"]()
    # the r3 curve-parity recipe (tools/run_curves.py SAC_CONFIGS) shrunk
    # to a cold-start-sized run
    sac.train(
        environment=env,
        num_timesteps=num_timesteps,
        episode_length=1000,
        num_envs=128,
        batch_size=256,
        min_replay_size=8192,
        max_replay_size=1048576,
        grad_updates_per_step=4,
        learning_rate=6e-4,
        discounting=0.99,
        reward_scaling=10.0,
        normalize_observations=True,
        num_evals=3,
        seed=0,
        progress_fn=progress,
        aot_cache=True,
    )
    total_s = time.time() - t0
    out = {
        "agent": "sac_humanoid",
        "num_timesteps": num_timesteps,
        "device_ready_s": round(device_ready_s, 1),
        "time_to_first_eval_s": round(events[0][2], 1) if events else None,
        "total_s": round(total_s, 1),
        "final_reward": round(events[-1][1], 1) if events else None,
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
