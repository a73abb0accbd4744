"""RL training CLI: env + trainer selection, TensorBoard metrics, artifacts.

Behavior parity: /root/reference/brax/training/learner.py (absl flags 37-114,
trainer dispatch 117-185, artifact dumps 186-230).  Uses argparse instead of
absl; entry point: `python -m brax_tpu.training.learner` or bin/learn.
"""

from __future__ import annotations

import argparse
import os

import jax

from brax_tpu import envs
from brax_tpu.io import html, metrics, model, npy_file
from brax_tpu.training.agents.apg import train as apg
from brax_tpu.training.agents.ars import train as ars
from brax_tpu.training.agents.es import train as es
from brax_tpu.training.agents.ppo import train as ppo
from brax_tpu.training.agents.sac import train as sac


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="brax_tpu on-device RL training")
    p.add_argument("--learner", default="ppo", choices=["ppo", "apg", "es", "sac", "ars"])
    p.add_argument("--env", default="ant")
    p.add_argument("--engine", default="v1", choices=["v1", "v2"],
                   help="v1: maximal-coordinate PBD engine (17 envs); "
                        "v2: generalized-coordinate engine (brax_tpu.v2.envs)")
    p.add_argument("--backend", default="generalized",
                   choices=["generalized", "spring", "positional"],
                   help="v2 physics backend (--engine v2 only)")
    p.add_argument("--total_env_steps", type=int, default=50_000_000)
    p.add_argument("--num_evals", type=int, default=10)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--num_envs", type=int, default=4)
    p.add_argument("--action_repeat", type=int, default=1)
    p.add_argument("--unroll_length", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--num_minibatches", type=int, default=1)
    p.add_argument("--num_updates_per_batch", type=int, default=1)
    p.add_argument("--reward_scaling", type=float, default=10.0)
    p.add_argument("--entropy_cost", type=float, default=3e-4)
    p.add_argument("--episode_length", type=int, default=1000)
    p.add_argument("--discounting", type=float, default=0.99)
    p.add_argument("--learning_rate", type=float, default=5e-4)
    p.add_argument("--max_gradient_norm", type=float, default=1e9)
    p.add_argument("--logdir", default="/tmp/brax_tpu_learner")
    p.add_argument("--normalize_observations", action="store_true", default=True)
    p.add_argument("--aot_cache", action="store_true", default=False,
                   help="cache traced+lowered programs (StableHLO) on disk: "
                        "warm restarts skip minutes of fused-kernel tracing "
                        "(all trainers; see brax_tpu/aot.py)")
    p.add_argument("--no_normalize_observations", dest="normalize_observations",
                   action="store_false")
    p.add_argument("--num_videos", type=int, default=1)
    p.add_argument("--num_trajectories_npy", type=int, default=0)
    # ES
    p.add_argument("--population_size", type=int, default=1)
    p.add_argument("--perturbation_std", type=float, default=0.1)
    p.add_argument("--fitness_shaping", default="original",
                   choices=["original", "centered_rank", "wierstra"])
    p.add_argument("--center_fitness", action="store_true")
    p.add_argument("--l2coeff", type=float, default=0.0)
    # SAC
    p.add_argument("--min_replay_size", type=int, default=8192)
    p.add_argument("--max_replay_size", type=int, default=1048576)
    p.add_argument("--grad_updates_per_step", type=int, default=1)
    # PPO
    p.add_argument("--gae_lambda", type=float, default=0.95)
    p.add_argument("--clipping_epsilon", type=float, default=0.3)
    # ARS
    p.add_argument("--number_of_directions", type=int, default=60)
    p.add_argument("--top_directions", type=int, default=20)
    p.add_argument("--exploration_noise_std", type=float, default=0.1)
    p.add_argument("--reward_shift", type=float, default=0.0)
    # APG
    p.add_argument("--truncation_length", type=int, default=None)
    # sweeps (braxlines experiment infra)
    p.add_argument("--sweep", default=None,
                   help="run a named sweep from brax_tpu.braxlines.sweeps "
                        "(pro_ant, mimax, ma_chase) instead of one training "
                        "run; writes per-run csvs + merged plots to --logdir")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    # cold-start cost control: every program shape compiles at most once per
    # machine (the fused Pallas kernels take minutes to compile cold)
    from brax_tpu.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    if args.sweep:
        from brax_tpu.braxlines import sweeps

        return sweeps.run(args.sweep, args.logdir)

    with metrics.Writer(args.logdir) as writer:
        writer.write_hparams(
            {
                "num_evals": args.num_evals,
                "num_envs": args.num_envs,
                "total_env_steps": args.total_env_steps,
            }
        )
        if args.engine == "v2":
            from brax_tpu.v2 import envs as v2_envs

            environment = v2_envs.get_environment(args.env, backend=args.backend)
        else:
            environment = envs._envs[args.env]()
        if args.learner == "sac":
            make_policy, params, _ = sac.train(
                environment=environment,
                num_envs=args.num_envs,
                action_repeat=args.action_repeat,
                normalize_observations=args.normalize_observations,
                num_timesteps=args.total_env_steps,
                num_evals=args.num_evals,
                batch_size=args.batch_size,
                min_replay_size=args.min_replay_size,
                max_replay_size=args.max_replay_size,
                learning_rate=args.learning_rate,
                discounting=args.discounting,
                seed=args.seed,
                reward_scaling=args.reward_scaling,
                grad_updates_per_step=args.grad_updates_per_step,
                episode_length=args.episode_length,
                progress_fn=writer.write_scalars,
                aot_cache=args.aot_cache,
            )
        elif args.learner == "es":
            make_policy, params, _ = es.train(
                environment=environment,
                num_timesteps=args.total_env_steps,
                fitness_shaping=es.FitnessShaping[args.fitness_shaping.upper()],
                population_size=args.population_size,
                perturbation_std=args.perturbation_std,
                normalize_observations=args.normalize_observations,
                action_repeat=args.action_repeat,
                num_evals=args.num_evals,
                center_fitness=args.center_fitness,
                l2coeff=args.l2coeff,
                learning_rate=args.learning_rate,
                seed=args.seed,
                episode_length=args.episode_length,
                progress_fn=writer.write_scalars,
                aot_cache=args.aot_cache,
            )
        elif args.learner == "ppo":
            make_policy, params, _ = ppo.train(
                environment=environment,
                num_timesteps=args.total_env_steps,
                episode_length=args.episode_length,
                action_repeat=args.action_repeat,
                num_envs=args.num_envs,
                learning_rate=args.learning_rate,
                entropy_cost=args.entropy_cost,
                discounting=args.discounting,
                seed=args.seed,
                unroll_length=args.unroll_length,
                batch_size=args.batch_size,
                num_minibatches=args.num_minibatches,
                normalize_observations=args.normalize_observations,
                num_updates_per_batch=args.num_updates_per_batch,
                num_evals=args.num_evals,
                reward_scaling=args.reward_scaling,
                gae_lambda=args.gae_lambda,
                clipping_epsilon=args.clipping_epsilon,
                progress_fn=writer.write_scalars,
                aot_cache=args.aot_cache,
            )
        elif args.learner == "apg":
            make_policy, params, _ = apg.train(
                environment=environment,
                num_envs=args.num_envs,
                action_repeat=args.action_repeat,
                num_evals=args.num_evals,
                learning_rate=args.learning_rate,
                seed=args.seed,
                normalize_observations=args.normalize_observations,
                max_gradient_norm=args.max_gradient_norm,
                episode_length=args.episode_length,
                truncation_length=args.truncation_length,
                progress_fn=writer.write_scalars,
                aot_cache=args.aot_cache,
            )
        elif args.learner == "ars":
            make_policy, params, _ = ars.train(
                environment=environment,
                number_of_directions=args.number_of_directions,
                action_repeat=args.action_repeat,
                normalize_observations=args.normalize_observations,
                num_timesteps=args.total_env_steps,
                exploration_noise_std=args.exploration_noise_std,
                num_evals=args.num_evals,
                seed=args.seed,
                step_size=args.learning_rate,
                top_directions=args.top_directions,
                reward_shift=args.reward_shift,
                episode_length=args.episode_length,
                progress_fn=writer.write_scalars,
                aot_cache=args.aot_cache,
            )

    path = os.path.join(args.logdir, f"{args.env}_{args.learner}.pkl")
    model.save_params(path, params)
    print(f"saved params to {path}")

    # post-training rollouts for videos / trajectory dumps
    n_rollouts = max(args.num_videos, args.num_trajectories_npy)
    if n_rollouts == 0:
        return

    if args.engine == "v2":
        from brax_tpu.v2 import envs as v2_envs
        from brax_tpu.v2 import io as v2_io

        env = v2_envs.create(
            args.env,
            backend=args.backend,
            episode_length=args.episode_length,
            auto_reset=False,
        )
        inference = make_policy(params)

        @jax.jit
        def v2_next(state, key):
            new_key, tmp_key = jax.random.split(key)
            act = inference(state.obs, tmp_key)[0]
            return env.step(state, act), new_key

        rng = jax.random.PRNGKey(args.seed)
        for i in range(n_rollouts):
            rng, env_key = jax.random.split(rng)
            state = jax.jit(env.reset)(env_key)
            pipeline_states = []
            steps = 0
            while not state.done and steps < args.episode_length:
                pipeline_states.append(state.pipeline_state)
                state, rng = v2_next(state, rng)
                steps += 1
            if i < args.num_videos:
                html_path = f"{args.logdir}/saved_videos/trajectory_{i:04d}.html"
                os.makedirs(os.path.dirname(html_path), exist_ok=True)
                v2_io.save_html(html_path, env.unwrapped.sys, pipeline_states)
                print(f"saved {html_path}")
        return

    env = envs.create(args.env, auto_reset=False)

    @jax.jit
    def jit_next_state(state, key):
        new_key, tmp_key = jax.random.split(key)
        act = make_policy(params)(state.obs, tmp_key)[0]
        return env.step(state, act), new_key

    def do_rollout(rng):
        rng, env_key = jax.random.split(rng)
        state = jax.jit(env.reset)(env_key)
        qps = []
        steps = 0
        while not state.done and steps < args.episode_length:
            qps.append(state.qp)
            state, rng = jit_next_state(state, rng)
            steps += 1
        return qps, rng

    trajectories = []
    rng = jax.random.PRNGKey(args.seed)
    for _ in range(n_rollouts):
        qps, rng = do_rollout(rng)
        trajectories.append(qps)

    if hasattr(env.unwrapped, "art"):
        for i in range(args.num_videos):
            html_path = f"{args.logdir}/saved_videos/trajectory_{i:04d}.html"
            html.save_html(html_path, env.unwrapped.art.config, trajectories[i])
            print(f"saved {html_path}")
    for i in range(args.num_trajectories_npy):
        qp_path = f"{args.logdir}/saved_qps/trajectory_{i:04d}.npy"
        npy_file.save(qp_path, trajectories[i])
        print(f"saved {qp_path}")


if __name__ == "__main__":
    main()
