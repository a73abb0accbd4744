"""Braxlines sweep/experiment infra tests.

Parity target: /root/reference/brax/experimental/braxlines/experiments/
__init__.py:36-371 (run_experiment/load_data/compute_statistics/plot_curves)
+ common/{config_utils,logger_utils}.py.
"""

import os

import numpy as np
import pytest

from brax_tpu.braxlines import experiments


def test_expand_grid_names_and_axes():
    cfg = {
        "env_name": "fast",
        "seed": [0, 1],
        "ppo_params": {"learning_rate": [1e-3, 3e-4], "num_envs": 8},
    }
    runs = experiments.expand_grid(cfg)
    assert len(runs) == 4
    names = [n for n, _ in runs]
    # swept keys only, compressed (seed -> s, ppo_params.learning_rate -> pp.lr)
    assert "s_0__pp.lr_0.001" in names
    for _, c in runs:
        assert c["env_name"] == "fast"
        assert c["ppo_params"]["num_envs"] == 8
        assert c["ppo_params"]["learning_rate"] in (1e-3, 3e-4)
    # list-of-dicts concatenates
    assert len(experiments.expand_grid([cfg, {"env_name": "ant"}])) == 5
    # tuples are literal values, not sweep axes (e.g. obs_indices=(0,))
    runs = experiments.expand_grid({"obs_indices": (0, 1), "seed": [0, 1]})
    assert len(runs) == 2
    assert all(c["obs_indices"] == (0, 1) for _, c in runs)


def test_csv_logger_roundtrip(tmp_path):
    path = str(tmp_path / "curves.csv")
    with experiments.CsvLogger(path) as log:
        for i in range(5):
            log.log(step=i, reward=float(i) * 2.0)
    data = experiments.parse_csv(path)
    np.testing.assert_array_equal(data["step"], np.arange(5.0))
    np.testing.assert_array_equal(data["reward"], np.arange(5.0) * 2)


def test_aggregate_merges_seeds():
    data = {
        "lr_0.001__s_0": {"step": np.arange(3.0), "r": np.array([0.0, 1, 2])},
        "lr_0.001__s_1": {"step": np.arange(3.0), "r": np.array([2.0, 3, 4])},
        "lr_0.01__s_0": {"step": np.arange(2.0), "r": np.array([5.0, 5])},
    }
    stats = experiments.aggregate(data)
    assert set(stats) == {"lr_0.001", "lr_0.01"}
    np.testing.assert_allclose(stats["lr_0.001"]["r"]["mean"], [1.0, 2, 3])
    np.testing.assert_allclose(stats["lr_0.001"]["r"]["std"], [1.0, 1, 1])
    # shorter member truncates nothing here; single-member group has std 0
    np.testing.assert_allclose(stats["lr_0.01"]["r"]["std"], [0.0, 0])


def test_run_sweep_end_to_end(tmp_path):
    """Two-seed PPO sweep on the fast env: csv curves per run, seed-merged
    stats, and a plot PNG."""
    from brax_tpu.braxlines import sweeps

    out = str(tmp_path / "sweep")
    cfg = {
        "env_name": "fast",
        "seed": [0, 1],
        "ppo_params": {
            "num_timesteps": 2**12,
            "episode_length": 128,
            "num_envs": 16,
            "learning_rate": 3e-4,
            "entropy_cost": 1e-2,
            "discounting": 0.95,
            "unroll_length": 4,
            "batch_size": 16,
            "num_minibatches": 2,
            "num_updates_per_batch": 2,
            "normalize_observations": True,
            "num_evals": 2,
            "reward_scaling": 10.0,
        },
    }
    dirs = experiments.run_sweep(sweeps.AGENTS["ppo"], cfg, out)
    assert len(dirs) == 2
    for d in dirs:
        assert os.path.isfile(os.path.join(d, "config.json"))
        curves = experiments.parse_csv(
            os.path.join(d, "training_curves.csv")
        )
        assert "eval/episode_reward" in curves
        assert len(curves["step"]) >= 2

    data = experiments.load_sweep(out)
    stats = experiments.aggregate(data)
    assert len(stats) == 1  # both runs merged over the seed tag
    group = next(iter(stats.values()))
    assert "eval/episode_reward" in group
    experiments.plot_sweep(stats, output_path=out)
    assert os.path.isfile(os.path.join(out, "training_curves.png"))


def test_named_sweeps_expand():
    """Every canned sweep grid-expands and names a registered agent."""
    from brax_tpu.braxlines import sweeps

    for name, cfg in sweeps.SWEEPS.items():
        cfg = dict(cfg)
        agent = cfg.pop("agent")
        assert agent in sweeps.AGENTS, name
        runs = experiments.expand_grid(cfg)
        assert len(runs) >= 2, name
