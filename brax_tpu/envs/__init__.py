"""Environment registry.

Parity: /root/reference/brax/envs/__init__.py:45-131 (fork defaults: ant uses
contact-force observations).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Type, Union

from brax_tpu.envs import base
from brax_tpu.envs.acrobot import Acrobot
from brax_tpu.envs.ant import Ant
from brax_tpu.envs.base import Env, State, Wrapper
from brax_tpu.envs.fast import Fast
from brax_tpu.envs.fetch import Fetch
from brax_tpu.envs.grasp import Grasp
from brax_tpu.envs.halfcheetah import Halfcheetah
from brax_tpu.envs.hopper import Hopper
from brax_tpu.envs.humanoid import Humanoid, HumanoidLegacy
from brax_tpu.envs.humanoid_standup import HumanoidStandup
from brax_tpu.envs.inverted_double_pendulum import InvertedDoublePendulum
from brax_tpu.envs.inverted_pendulum import InvertedPendulum
from brax_tpu.envs.pusher import Pusher
from brax_tpu.envs.reacher import Reacher
from brax_tpu.envs.reacherangle import ReacherAngle
from brax_tpu.envs.swimmer import Swimmer
from brax_tpu.envs.ur5e import Ur5e
from brax_tpu.envs.walker2d import Walker2d

_envs = {
    "acrobot": Acrobot,
    "ant": functools.partial(Ant, use_contact_forces=True),
    "fast": Fast,
    "fetch": Fetch,
    "grasp": Grasp,
    "halfcheetah": Halfcheetah,
    "hopper": Hopper,
    # the reference registry maps 'humanoid' to the fork's humanoid_new
    # (reference brax/envs/__init__.py:28-29)
    "humanoid": Humanoid,
    "humanoid_legacy": HumanoidLegacy,
    "humanoidstandup": HumanoidStandup,
    "inverted_pendulum": InvertedPendulum,
    "inverted_double_pendulum": InvertedDoublePendulum,
    "pusher": Pusher,
    "reacher": Reacher,
    "reacherangle": ReacherAngle,
    "swimmer": Swimmer,
    "ur5e": Ur5e,
    "walker2d": Walker2d,
}


def register(name: str, factory) -> None:
    _envs[name] = factory


def create(
    env_name: str,
    episode_length: int = 1000,
    action_repeat: int = 1,
    auto_reset: bool = True,
    batch_size: Optional[int] = None,
    eval_metrics: bool = False,
    **kwargs,
) -> Env:
    """Creates an Env with a specified wrapper stack."""
    from brax_tpu.envs import wrappers

    env = _envs[env_name](**kwargs)
    if episode_length is not None:
        env = wrappers.EpisodeWrapper(env, episode_length, action_repeat)
    if batch_size:
        env = wrappers.VmapWrapper(env, batch_size)
    if auto_reset:
        env = wrappers.AutoResetWrapper(env)
    if eval_metrics:
        env = wrappers.EvalWrapper(env)
    return env


def create_fn(env_name: str, **kwargs) -> Callable[..., Env]:
    return functools.partial(create, env_name, **kwargs)


def create_gym_env(env_name: str, batch_size: Optional[int] = None,
                   seed: int = 0, backend: Optional[str] = None, **kwargs):
    """Creates a Gym-API env (parity: reference envs/__init__.py:118-131)."""
    from brax_tpu.envs import interop

    environment = create(env_name, batch_size=batch_size, **kwargs)
    if batch_size is None:
        return interop.GymWrapper(environment, seed=seed, backend=backend)
    if batch_size <= 0:
        raise ValueError("`batch_size` should either be None or a positive integer.")
    return interop.VectorGymWrapper(environment, seed=seed, backend=backend)
