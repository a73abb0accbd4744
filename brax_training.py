"""Humanoid PPO training recipe (root-level driver script).

Role parity with the reference fork's root brax_training.py:50-90: trains
humanoid with the published 50M-step PPO hyperparameters, logs the learning
curve, saves params + an HTML rollout, and prints time-to-jit /
time-to-train.  Scaled-down runs via --num_timesteps for smoke testing.
"""

import argparse
import functools
import os
from datetime import datetime

from brax_tpu import envs
from brax_tpu.io import html, model
from brax_tpu.training.agents.ppo import train as ppo


def main():
    from brax_tpu.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--env", default="humanoid")
    parser.add_argument("--num_timesteps", type=int, default=50_000_000)
    parser.add_argument("--num_envs", type=int, default=2048)
    parser.add_argument("--batch_size", type=int, default=1024)
    parser.add_argument("--logdir", default="/tmp/brax_tpu_training")
    parser.add_argument("--seed", type=int, default=1)
    args = parser.parse_args()

    os.makedirs(args.logdir, exist_ok=True)
    env = envs._envs[args.env]()

    train_fn = functools.partial(
        ppo.train,
        num_timesteps=args.num_timesteps,
        num_evals=max(2, args.num_timesteps // 1_250_000),
        reward_scaling=0.1,
        episode_length=1000,
        normalize_observations=True,
        action_repeat=1,
        unroll_length=10,
        num_minibatches=32,
        num_updates_per_batch=8,
        discounting=0.97,
        learning_rate=3e-4,
        entropy_cost=1e-3,
        num_envs=args.num_envs,
        batch_size=args.batch_size,
        seed=args.seed,
    )

    times = [datetime.now()]
    curve = []

    def progress(num_steps, metrics):
        times.append(datetime.now())
        reward = metrics.get("eval/episode_reward")
        curve.append((num_steps, float(reward) if reward is not None else 0.0))
        print(f"steps {num_steps:>12,}  reward {curve[-1][1]:10.1f}", flush=True)

    make_inference_fn, params, _ = train_fn(environment=env, progress_fn=progress)

    print(f"time to jit: {times[1] - times[0]}")
    print(f"time to train: {times[-1] - times[1]}")

    model.save_params(os.path.join(args.logdir, f"{args.env}_params.pkl"), params)
    with open(os.path.join(args.logdir, "curve.csv"), "w") as f:
        f.writelines(f"{s},{r}\n" for s, r in curve)

    # render an evaluation rollout
    import jax
    import jax.numpy as jnp

    eval_env = envs._envs[args.env]()
    inference_fn = make_inference_fn(params, deterministic=True)
    rng = jax.random.PRNGKey(0)
    state = jax.jit(eval_env.reset)(rng)
    qps = []
    step = jax.jit(eval_env.step)
    infer = jax.jit(inference_fn)
    for _ in range(500):
        qps.append(state.qp)
        rng, key = jax.random.split(rng)
        act, _ = infer(state.obs, key)
        state = step(state, act)
    html.save_html(
        os.path.join(args.logdir, f"{args.env}_rollout.html"),
        eval_env.art.config,
        qps,
    )
    print(f"artifacts saved to {args.logdir}")


if __name__ == "__main__":
    main()
