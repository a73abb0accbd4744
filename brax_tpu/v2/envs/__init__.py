"""v2 environment registry (reference brax/v2/envs/__init__.py).

The reference registers only `ant` on v2; the rest of the classic task
suite (halfcheetah, hopper, humanoid, inverted pendulums, reacher,
walker2d) is ported here as well.
"""

from typing import Callable, Dict, Type

from brax_tpu.v2.envs import wrappers
from brax_tpu.v2.envs.ant import Ant
from brax_tpu.v2.envs.env import Env, PipelineEnv, State, Wrapper
from brax_tpu.v2.envs.halfcheetah import Halfcheetah
from brax_tpu.v2.envs.hopper import Hopper
from brax_tpu.v2.envs.humanoid import Humanoid
from brax_tpu.v2.envs.inverted_double_pendulum import InvertedDoublePendulum
from brax_tpu.v2.envs.inverted_pendulum import InvertedPendulum
from brax_tpu.v2.envs.reacher import Reacher
from brax_tpu.v2.envs.walker2d import Walker2d

_envs: Dict[str, Type[PipelineEnv]] = {
    "ant": Ant,
    "halfcheetah": Halfcheetah,
    "hopper": Hopper,
    "humanoid": Humanoid,
    "inverted_double_pendulum": InvertedDoublePendulum,
    "inverted_pendulum": InvertedPendulum,
    "reacher": Reacher,
    "walker2d": Walker2d,
}


def get_environment(env_name: str, **kwargs) -> Env:
    return _envs[env_name](**kwargs)


def register_environment(env_name: str, env_class: Type[PipelineEnv]):
    _envs[env_name] = env_class


def create(
    env_name: str,
    episode_length: int = 1000,
    action_repeat: int = 1,
    auto_reset: bool = True,
    batch_size: int = None,
    **kwargs,
) -> Env:
    """Creates an env with the standard training wrapper stack."""
    env = _envs[env_name](**kwargs)
    if episode_length is not None:
        env = wrappers.EpisodeWrapper(env, episode_length, action_repeat)
    if batch_size:
        env = wrappers.VmapWrapper(env, batch_size)
    if auto_reset:
        env = wrappers.AutoResetWrapper(env)
    return env
