"""Canned sweep definitions + trainer adapters for `experiments.run_sweep`.

Redesigns the reference's per-study sweep modules
(/root/reference/brax/experimental/braxlines/experiments/{composer_sweep,
mimax_sweep,chase_ma_sweep,sumo_ma_sweep}.py) as data: each sweep is a grid
config plus the name of an adapter in `AGENTS` that knows how to train one
grid point and report through `progress_fn`.

Usage:
    from brax_tpu.braxlines import experiments, sweeps
    dirs = sweeps.run("pro_ant", "/tmp/sweep_out")
    stats = experiments.aggregate(experiments.load_sweep("/tmp/sweep_out"))
    experiments.plot_sweep(stats, output_path="/tmp/sweep_out")
"""

from __future__ import annotations

from typing import Any, Dict

from brax_tpu.braxlines import experiments

# ---------------------------- adapters -----------------------------


def _ppo(cfg: Dict[str, Any], progress_fn, output_dir):
    """Plain PPO on a registered env."""
    from brax_tpu import envs
    from brax_tpu.training.agents.ppo import train as ppo

    env = envs._envs[cfg["env_name"]]()
    params = dict(cfg.get("ppo_params", {}))
    return ppo.train(
        env, seed=cfg.get("seed", 0), progress_fn=progress_fn, **params
    )


def _composer_ppo(cfg: Dict[str, Any], progress_fn, output_dir):
    """PPO on a composed (single-agent-group) scene, e.g. pro_ant."""
    from brax_tpu import composer
    from brax_tpu.training.agents.ppo import train as ppo

    env = composer.create(
        components=cfg["components"],
        edges=cfg.get("edges"),
        episode_length=None,  # the trainer applies its own wrapper stack
        auto_reset=False,
    )
    params = dict(cfg.get("ppo_params", {}))
    return ppo.train(
        env, seed=cfg.get("seed", 0), progress_fn=progress_fn, **params
    )


def _desc_ppo(cfg: Dict[str, Any], progress_fn, output_dir):
    """PPO on a registered composed task desc with optional desc_edits —
    the reference composer_sweep mechanism (env_name + desc_edits axes)."""
    from brax_tpu.composer import envs as cenvs
    from brax_tpu.training.agents.ppo import train as ppo

    # grid expansion round-trips nested dicts, so desc_edits arrives nested;
    # edit_desc wants dotted paths — flatten back
    desc_edits = cfg.get("desc_edits")
    if desc_edits:
        desc_edits = dict(experiments._flatten(desc_edits))
    env = cenvs.create_env(
        cfg["env_name"],
        desc_edits=desc_edits,
        episode_length=None,  # the trainer applies its own wrapper stack
        auto_reset=False,
        **cfg.get("env_params", {}),
    )
    params = dict(cfg.get("ppo_params", {}))
    return ppo.train(
        env, seed=cfg.get("seed", 0), progress_fn=progress_fn, **params
    )


def _pro_ant_ppo(cfg: Dict[str, Any], progress_fn, output_dir):
    cfg = dict(cfg)
    cfg["env_name"] = "pro_ant_run"
    cfg["env_params"] = {"num_legs": cfg.pop("num_legs", 4)}
    return _desc_ppo(cfg, progress_fn, output_dir)


def _vgcrl(cfg: Dict[str, Any], progress_fn, output_dir):
    """Skill discovery (DIAYN / cDIAYN / GCRL) on a registered env."""
    from brax_tpu import envs
    from brax_tpu.braxlines import discriminators, train

    env = envs._envs[cfg["env_name"]]()
    algo = cfg.get("algo", "diayn")
    kind = {
        "diayn": dict(q_fn="mlp", dist_q="categorical", dist_p="categorical"),
        "cdiayn": dict(q_fn="mlp", dist_q="normal", dist_p="uniform"),
        "gcrl": dict(q_fn="indexing", dist_q="normal", dist_p="uniform"),
    }[algo]
    if "obs_indices" in cfg:
        idx, scale = tuple(cfg["obs_indices"]), cfg.get("obs_scale", 5.0)
    else:  # look up the registered semantic indices for this env
        from brax_tpu.braxlines import obs_indices as oi

        idx, scale = oi.get_indices(cfg["env_name"], "vel")
        scale = cfg.get("obs_scale", scale)
    disc = discriminators.SkillDiscriminator(
        obs_indices=idx,
        obs_scale=scale,
        z_size=cfg.get("z_size", 2),
        **kind,
    )
    params = dict(cfg.get("ppo_params", {}))
    return train.train_vgcrl(
        env, disc, seed=cfg.get("seed", 0), progress_fn=progress_fn, **params
    )


def _mappo(cfg: Dict[str, Any], progress_fn, output_dir):
    """Multi-agent PPO on a registered ma_descs task (chase/follow/sumo)."""
    from brax_tpu.composer import envs as cenvs
    from brax_tpu.composer.training import mappo

    params = dict(cfg.get("ppo_params", {}))
    episode_length = params.get("episode_length", 128)
    env = cenvs.create_ma_env(
        task=cfg["task"],
        episode_length=None,
        auto_reset=False,
        num_agents=cfg.get("num_agents", 2),
    )
    params.setdefault("episode_length", episode_length)
    return mappo.train(
        env, seed=cfg.get("seed", 0), progress_fn=progress_fn, **params
    )


AGENTS = {
    "ppo": _ppo,
    "composer_ppo": _composer_ppo,
    "desc_ppo": _desc_ppo,
    "pro_ant_ppo": _pro_ant_ppo,
    "vgcrl": _vgcrl,
    "mappo": _mappo,
}

# ----------------------------- sweeps -------------------------------

_PPO_FAST = {  # CI-sized recipe; scale num_timesteps/num_envs up on HW
    "num_timesteps": 2**15,
    "episode_length": 128,
    "num_envs": 64,
    "learning_rate": 3e-4,
    "entropy_cost": 1e-2,
    "discounting": 0.95,
    "unroll_length": 5,
    "batch_size": 64,
    "num_minibatches": 8,
    "num_updates_per_batch": 4,
    "normalize_observations": True,
    "num_evals": 3,
    "reward_scaling": 10.0,
}

SWEEPS: Dict[str, Dict[str, Any]] = {
    # parity: composer_sweep.py pro_ant_run num_legs grid
    "pro_ant": {
        "agent": "pro_ant_ppo",
        "num_legs": [2, 4, 6],
        "seed": [0],
        "ppo_params": dict(_PPO_FAST, num_timesteps=2**14),
    },
    # parity: mimax_sweep.py algo grid (DIAYN family)
    "mimax": {
        "agent": "vgcrl",
        "env_name": "fast",
        "algo": ["diayn", "cdiayn"],
        "obs_indices": (0,),
        "seed": [0, 1],
        "ppo_params": dict(_PPO_FAST, num_timesteps=2**13),
    },
    # parity: composer_sweep.py ant_push desc_edits grid
    "ant_push": {
        "agent": "desc_ppo",
        "env_name": "ant_push",
        "desc_edits": {
            "components.cap1.reward_fns.goal.scale": [0.2, 1.0, 0.5],
        },
        "seed": [0],
        "ppo_params": dict(_PPO_FAST, num_timesteps=2**14),
    },
    # parity: chase_ma_sweep.py num-agents grid
    "ma_chase": {
        "agent": "mappo",
        "task": "chase",
        "num_agents": [2, 3],
        "seed": [0],
        "ppo_params": {
            "num_timesteps": 2**13,
            "episode_length": 128,
            "num_envs": 16,
            "unroll_length": 4,
            "batch_size": 16,
            "num_minibatches": 2,
            "num_updates_per_batch": 2,
            "num_evals": 2,
            "normalize_observations": True,
        },
    },
}


def run(sweep_name: str, output_path: str, ignore_errors: bool = False,
        **overrides):
    """Runs a named sweep end-to-end and writes aggregate plots."""
    cfg = dict(SWEEPS[sweep_name])
    agent = AGENTS[cfg.pop("agent")]
    cfg.update(overrides)
    dirs = experiments.run_sweep(
        agent, cfg, output_path, ignore_errors=ignore_errors
    )
    stats = experiments.aggregate(experiments.load_sweep(output_path))
    experiments.plot_sweep(stats, output_path=output_path)
    return dirs
