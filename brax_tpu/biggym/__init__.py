"""BIG-Gym: a crowd-sourced registry of environments, components, and tasks.

Contributors register (a) plain envs, (b) composer components, which are then
automatically entered into goal-oriented task tracks (race/sumo/chase) built
on the composer.  Role parity: /root/reference/brax/experimental/biggym.
"""

from __future__ import annotations

import difflib
from typing import Any, Callable, Dict, Optional

from brax_tpu import composer as composer_lib
from brax_tpu import envs as base_envs
from brax_tpu.biggym import tasks
from brax_tpu.composer import components as composer_components

ENVS: Dict[str, Callable] = {}
COMPONENTS: Dict[str, str] = {}
ENVS_BY_TRACKS: Dict[str, list] = {
    "open_ended": [],
    **{k: [] for k in tasks.TASKS},
}


def register(
    registry_name: str,
    env_fn: Optional[Callable] = None,
    component_fn: Optional[Callable] = None,
    track: str = "open_ended",
):
    """Registers a contributed env and/or composer component.

    Registering a component automatically creates one task env per
    goal-oriented track (e.g. race_<name>, sumo_<name>_vs_<name>).
    """
    created = []
    if env_fn is not None:
        name = registry_name
        ENVS[name] = env_fn
        base_envs.register(name, env_fn)
        ENVS_BY_TRACKS["open_ended"].append(name)
        created.append(name)
    if component_fn is not None:
        comp_name = registry_name
        composer_components.register_component(comp_name, component_fn)
        COMPONENTS[comp_name] = comp_name
        for track_name, task_fn in tasks.TASKS.items():
            env_name = f"{track_name}_{comp_name}"
            ENVS[env_name] = task_fn(comp_name)
            ENVS_BY_TRACKS[track_name].append(env_name)
            created.append(env_name)
    return created


def list_env():
    return sorted(base_envs._envs) + sorted(ENVS)


def exists(env_name: str) -> bool:
    return env_name in list_env()


def assert_exists(env_name: str):
    if not exists(env_name):
        closest = difflib.get_close_matches(env_name, list_env(), n=3)
        raise AssertionError(f"{env_name} not found. Closest={closest}")


def create(env_name: str, **kwargs):
    """Creates a registered (task) environment."""
    assert_exists(env_name)
    if env_name in ENVS:
        return ENVS[env_name](**kwargs)
    return base_envs.create(env_name, **kwargs)
