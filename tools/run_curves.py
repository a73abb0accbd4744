"""Learning-curve parity runner (BASELINE configs 2-4, VERDICT r1 item 2).

Runs one (impl, agent, env, seed) combo on the current jax backend with the
reference's published hyperparameters and writes a curve JSON compatible
with the reference's vendored sweep archives (datasets/README.md:1-37,
hyperparams + env_steps + wallclock + reward arrays).

  python tools/run_curves.py --impl ours --agent ppo --env halfcheetah \
      --seed 0 --out CURVES_r02/

--impl ref runs the reference trainer (/root/reference/brax/training/...)
on the same chip through the tests/reference.py compat shims, so both
frameworks face identical hardware.

PPO configs are the best-final-reward entries of the reference's own 10M
sweep (datasets/ppo_10_million_steps.tar.gz); reacher has no published
entry, so it gets a mid-range config from the same sweep grid.  SAC uses
the sweep ranges of datasets/README.md:24-37.
"""

import argparse
import functools
import json
import os
import sys
import time

# PPO: best published 10M-step configs (see module docstring)
PPO_CONFIGS = {
    "halfcheetah": dict(
        num_timesteps=10_000_000, reward_scaling=1.0, entropy_cost=1e-3,
        discounting=0.99, unroll_length=5, batch_size=512,
        num_minibatches=32, num_updates_per_batch=8,
    ),
    "ant": dict(
        num_timesteps=10_000_000, reward_scaling=1.0, entropy_cost=1e-3,
        discounting=0.99, unroll_length=5, batch_size=512,
        num_minibatches=8, num_updates_per_batch=4,
    ),
    # reacher has no published sweep entry; use the reference's tuned
    # defaults (braxlines/experiments/defaults.py:116-132) at 10M steps
    "reacher": dict(
        num_timesteps=10_000_000, reward_scaling=5.0, entropy_cost=1e-3,
        discounting=0.95, unroll_length=50, batch_size=256,
        num_minibatches=32, num_updates_per_batch=8, action_repeat=4,
    ),
    "humanoid": dict(
        num_timesteps=10_000_000, reward_scaling=5.0, entropy_cost=1e-3,
        discounting=0.997, unroll_length=5, batch_size=512,
        num_minibatches=4, num_updates_per_batch=8,
    ),
}
PPO_COMMON = dict(
    episode_length=1000, num_envs=2048, learning_rate=3e-4,
    normalize_observations=True, num_evals=21,
)

# grad_updates_per_step is an int on both sides (it is a reshape leading
# dim: ref sac/train.py:305); the sweep's fractional values were an
# internal-harness convention, so use a dense integer setting instead
SAC_CONFIGS = {
    "humanoid": dict(
        num_timesteps=5 * 1048576, reward_scaling=10.0, discounting=0.99,
        learning_rate=6e-4, num_envs=128, batch_size=256,
        min_replay_size=8192, max_replay_size=1048576,
        grad_updates_per_step=4,
    ),
    "halfcheetah": dict(
        num_timesteps=5 * 1048576, reward_scaling=5.0, discounting=0.99,
        learning_rate=6e-4, num_envs=128, batch_size=256,
        min_replay_size=8192, max_replay_size=1048576,
        grad_updates_per_step=4,
    ),
}
SAC_COMMON = dict(
    episode_length=1000, normalize_observations=True, num_evals=21,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--impl", choices=["ours", "ref"], required=True)
    p.add_argument("--agent", choices=["ppo", "sac"], required=True)
    p.add_argument("--env", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="CURVES_r02")
    p.add_argument("--num_timesteps", type=int, default=None)
    # smoke-test overrides (API validation on CPU before burning chip time)
    p.add_argument("--num_envs", type=int, default=None)
    p.add_argument("--num_evals", type=int, default=None)
    p.add_argument("--episode_length", type=int, default=None)
    p.add_argument("--min_replay_size", type=int, default=None)
    args = p.parse_args()

    if args.impl == "ours":
        from brax_tpu.compilation_cache import enable_compilation_cache

        enable_compilation_cache()

    if args.agent == "ppo":
        cfg = dict(PPO_COMMON, **PPO_CONFIGS[args.env])
    else:
        cfg = dict(SAC_COMMON, **SAC_CONFIGS[args.env])
    for k in ("num_timesteps", "num_envs", "num_evals", "episode_length",
              "min_replay_size"):
        v = getattr(args, k)
        if v is not None and (k != "min_replay_size" or args.agent == "sac"):
            cfg[k] = v

    if args.impl == "ref":
        sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
        import reference

        assert reference.setup(), "reference unavailable"
        from brax import envs as E

        if args.agent == "ppo":
            from brax.training.agents.ppo import train as T
        else:
            from brax.training.agents.sac import train as T
    else:
        from brax_tpu import envs as E

        if args.agent == "ppo":
            from brax_tpu.training.agents.ppo import train as T
        else:
            from brax_tpu.training.agents.sac import train as T

    import jax

    print(f"{args.impl} {args.agent} {args.env} seed={args.seed} on "
          f"{jax.devices()}", flush=True)

    if args.env == "humanoid":
        # the fork's registered 'humanoid' (humanoid_new) crashes on
        # construction (KeyError 'Target', humanoid_new.py:214 — see
        # tests/test_env_suite_parity.py); compare the WORKING pair:
        # reference humanoid.Humanoid <-> our HumanoidLegacy parity twin
        if args.impl == "ref":
            # the fork's envs/__init__ rebinds the 'humanoid' attribute to
            # humanoid_new; import the real module by path
            import importlib

            _h = importlib.import_module("brax.envs.humanoid")
            env = _h.Humanoid()
        else:
            from brax_tpu.envs import humanoid as _h

            env = _h.HumanoidLegacy()
    else:
        env = E._envs[args.env]()
    curve = {
        "impl": args.impl, "agent": args.agent, "env": args.env,
        "seed": args.seed, "hyperparams": cfg,
        "env_steps": [], "reward": [], "reward_std": [], "wallclock": [],
    }
    t0 = time.time()

    def progress(step, metrics):
        curve["env_steps"].append(int(step))
        curve["reward"].append(float(metrics.get("eval/episode_reward", 0.0)))
        curve["reward_std"].append(
            float(metrics.get("eval/episode_reward_std", 0.0))
        )
        curve["wallclock"].append(time.time() - t0)
        print(f"  step {step}: reward "
              f"{curve['reward'][-1]:.1f} +- {curve['reward_std'][-1]:.1f} "
              f"({curve['wallclock'][-1]:.0f}s)", flush=True)

    T.train(environment=env, seed=args.seed, progress_fn=progress, **cfg)

    os.makedirs(args.out, exist_ok=True)
    name = f"{args.agent}_{args.env}_{args.impl}_s{args.seed}.json"
    path = os.path.join(args.out, name)
    with open(path, "w") as f:
        json.dump(curve, f, indent=1)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
