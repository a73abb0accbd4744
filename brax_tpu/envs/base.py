"""Environment API: State, Env, Wrapper.

Pure-functional environments: `reset(rng) -> State` and
`step(state, action) -> State` with no hidden state, so the whole
rollout-train loop jits and shards as one program.

Parity: /root/reference/brax/envs/env.py:28-103.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu.sim import builder, initial
from brax_tpu.sim.config import Config
from brax_tpu.sim.types import QP, Array, Info


@struct.dataclass
class State:
    """Environment state for training and inference."""

    qp: QP
    obs: Array
    reward: Array
    done: Array
    metrics: Dict[str, Array] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class Env(abc.ABC):
    """API for driving a physics system for training and inference."""

    def __init__(self, config: Optional[Config]):
        if config is not None:
            self.sys, self.art = builder.build(config)

    @abc.abstractmethod
    def reset(self, rng: Array) -> State:
        """Resets the environment to an initial state."""

    @abc.abstractmethod
    def step(self, state: State, action: Array) -> State:
        """Run one timestep of the environment's dynamics."""

    def default_qp(self, default_index: int = 0, joint_angle=None, joint_velocity=None) -> QP:
        return initial.default_qp(self.art, default_index, joint_angle, joint_velocity)

    def default_angle(self, default_index: int = 0) -> Array:
        return initial.default_angle(self.art, default_index)

    @property
    def observation_size(self) -> int:
        rng = jax.random.PRNGKey(0)
        reset_state = jax.eval_shape(self.unwrapped.reset, rng)
        return reset_state.obs.shape[-1]

    @property
    def action_size(self) -> int:
        return self.sys.num_joint_dof + self.sys.num_forces_dof

    @property
    def unwrapped(self) -> "Env":
        return self


class Wrapper(Env):
    """Wraps an environment for modular transformations."""

    def __init__(self, env: Env):
        super().__init__(config=None)
        self.env = env

    def reset(self, rng: Array) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: Array) -> State:
        return self.env.step(state, action)

    @property
    def observation_size(self) -> int:
        return self.env.observation_size

    @property
    def action_size(self) -> int:
        return self.env.action_size

    @property
    def unwrapped(self) -> Env:
        return self.env.unwrapped

    def __getattr__(self, name):
        if name == "__setstate__":
            raise AttributeError(name)
        return getattr(self.env, name)
