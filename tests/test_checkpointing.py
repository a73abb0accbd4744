"""Full-state checkpoint/auto-resume for PPO and SAC.

Both trainers write orbax full-state checkpoints (optimizers + normalizer
+ step counters) per eval epoch and auto-resume from the newest step_* in
checkpoint_dir — an upgrade over the reference's params-only pickles
(io/model.py:23-32).
"""

import os

import jax
import pytest

from brax_tpu import envs


def _steps_seen(progress_steps):
    return [s for s in progress_steps if s > 0]


@pytest.mark.parametrize("agent", ["ppo", "sac"])
def test_full_state_checkpoint_and_resume(agent, tmp_path):
    fast = envs._envs["fast"]()
    ckpt = str(tmp_path / agent)

    def run(num_timesteps):
        steps = []

        def progress(step, metrics):
            steps.append(int(step))

        if agent == "ppo":
            from brax_tpu.training.agents.ppo import train as T

            T.train(
                fast, num_timesteps=num_timesteps, episode_length=64,
                num_envs=16, learning_rate=3e-4, entropy_cost=1e-2,
                discounting=0.95, unroll_length=4, batch_size=16,
                num_minibatches=2, num_updates_per_batch=1,
                normalize_observations=True, seed=0, num_evals=3,
                checkpoint_dir=ckpt, progress_fn=progress,
            )
        else:
            from brax_tpu.training.agents.sac import train as T

            T.train(
                fast, num_timesteps=num_timesteps, episode_length=64,
                num_envs=8, learning_rate=3e-4, discounting=0.95,
                batch_size=16, min_replay_size=32, max_replay_size=512,
                grad_updates_per_step=1, normalize_observations=True,
                seed=0, num_evals=3, checkpoint_dir=ckpt,
                progress_fn=progress,
            )
        return steps

    first = run(2048)
    dirs = sorted(d for d in os.listdir(ckpt) if d.startswith("step_"))
    assert dirs, "no checkpoints written"
    max_step_1 = max(_steps_seen(first))
    assert max_step_1 >= 2048

    # second run auto-resumes: its step counter continues past run 1's
    second = run(2048)
    assert max(_steps_seen(second)) > max_step_1, (first, second)
