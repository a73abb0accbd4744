"""Environment API over the v2 physics pipelines.

Parity with reference brax/v2/envs/env.py: State wraps a pipeline state plus
obs/reward/done/metrics/info; PipelineEnv scans n_frames physics steps per
env step over a selectable backend.
"""

from __future__ import annotations

import abc
from typing import Any, Dict

import jax
import jax.numpy as jnp
from flax import struct

from brax_tpu.v2 import base
from brax_tpu.v2.generalized import pipeline as g_pipeline
from brax_tpu.v2.positional import pipeline as p_pipeline
from brax_tpu.v2.spring import pipeline as s_pipeline


@struct.dataclass
class State:
    """Environment state for training and inference."""

    pipeline_state: base.State
    obs: jnp.ndarray
    reward: jnp.ndarray
    done: jnp.ndarray
    metrics: Dict[str, jnp.ndarray] = struct.field(default_factory=dict)
    info: Dict[str, Any] = struct.field(default_factory=dict)


class Env(abc.ABC):
    """Interface for driving training and inference."""

    @abc.abstractmethod
    def reset(self, rng: jnp.ndarray) -> State:
        ...

    @abc.abstractmethod
    def step(self, state: State, action: jnp.ndarray) -> State:
        ...

    @property
    @abc.abstractmethod
    def observation_size(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def action_size(self) -> int:
        ...

    @property
    @abc.abstractmethod
    def backend(self) -> str:
        ...

    @property
    def unwrapped(self) -> "Env":
        return self


_PIPELINES = {
    "generalized": g_pipeline,
    "spring": s_pipeline,
    "positional": p_pipeline,
}


class PipelineEnv(Env):
    """Drives a v2 System through a physics pipeline.

    Unlike the reference (generalized/spring only, v2/envs/env.py:93), the
    positional backend is also selectable here.
    """

    __pytree_ignore__ = ("_backend", "_pipeline")

    def __init__(
        self, sys: base.System, backend: str = "generalized", n_frames: int = 1
    ):
        self.sys = sys
        if backend not in _PIPELINES:
            raise ValueError(f"backend should be in {sorted(_PIPELINES)}")
        self._backend = backend
        self._pipeline = _PIPELINES[backend]
        self._n_frames = n_frames

    def pipeline_init(self, q: jnp.ndarray, qd: jnp.ndarray) -> base.State:
        return self._pipeline.init(self.sys, q, qd)

    def pipeline_step(self, pipeline_state: Any, action: jnp.ndarray) -> base.State:
        """Scans n_frames physics steps.

        With the fused generalized kernel enabled (v2/generalized/kernels.py)
        and the System supported, dispatches through a custom-vmap step whose
        batching rule reroutes vmapped calls into one Pallas kernel; unbatched
        calls and unsupported backends take the identical lax.scan path.
        """
        if self._backend == "generalized":
            from brax_tpu.v2.generalized import kernels as g_kernels

            if g_kernels.enabled() and g_kernels.supported(self.sys):
                step_fn = g_kernels.custom_pipeline_step_for(
                    self.sys, self._n_frames
                )
                return step_fn(pipeline_state, action)

        def f(state, _):
            return self._pipeline.step(self.sys, state, action), None

        return jax.lax.scan(f, pipeline_state, (), self._n_frames)[0]

    @property
    def dt(self) -> jnp.ndarray:
        return self.sys.dt * self._n_frames

    @property
    def observation_size(self) -> int:
        rng = jax.random.PRNGKey(0)
        reset_state = self.unwrapped.reset(rng)
        return reset_state.obs.shape[-1]

    @property
    def action_size(self) -> int:
        return self.sys.act_size()

    @property
    def backend(self) -> str:
        return self._backend


class Wrapper(Env):
    """Wraps an environment for modular transformations."""

    def __init__(self, env: Env):
        self.env = env

    def reset(self, rng: jnp.ndarray) -> State:
        return self.env.reset(rng)

    def step(self, state: State, action: jnp.ndarray) -> State:
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

    @property
    def backend(self) -> str:
        return self.unwrapped.backend

    def __getattr__(self, name):
        if name == "__setstate__":
            raise AttributeError(name)
        return getattr(self.env, name)
