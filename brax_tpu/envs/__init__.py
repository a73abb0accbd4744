"""Environment registry.

Parity: /root/reference/brax/envs/__init__.py:45-131 (fork defaults: ant uses
contact-force observations).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Type, Union

from brax_tpu.envs import base
from brax_tpu.envs.ant import Ant
from brax_tpu.envs.fast import Fast
from brax_tpu.envs.base import Env, State, Wrapper

_envs = {
    "ant": functools.partial(Ant, use_contact_forces=True),
    "fast": Fast,
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
