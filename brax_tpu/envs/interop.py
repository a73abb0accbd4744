"""Gym / dm_env / torch interface wrappers.

Behavior parity: /root/reference/brax/envs/wrappers.py:205-428 (GymWrapper,
VectorGymWrapper, DmEnvWrapper) and /root/reference/brax/envs/to_torch.py
(JaxToTorchWrapper).  Uses `gymnasium` when classic `gym` is absent.
"""

from __future__ import annotations

from typing import ClassVar, Optional

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.envs import base

def _import_gym():
    """Classic gym if a REAL install is present, else gymnasium.

    (Guards against stub `gym` modules that test shims may have planted in
    sys.modules for the reference snapshot's sake.)"""
    try:
        import gym as _gym

        if isinstance(getattr(_gym, "Env", None), type) and _gym.Env is not object:
            from gym import spaces as _spaces
            from gym.vector import utils as _utils

            return _gym, _spaces, _utils
    except ImportError:
        pass
    import gymnasium as _gym
    from gymnasium import spaces as _spaces
    from gymnasium.vector import utils as _utils

    return _gym, _spaces, _utils


gym, spaces, gym_vector_utils = _import_gym()


class GymWrapper(gym.Env):
    """Exposes a brax_tpu Env through the Gym API."""

    _gym_disable_underscore_compat: ClassVar[bool] = True

    def __init__(self, env: base.Env, seed: int = 0, backend: Optional[str] = None):
        self._env = env
        art = getattr(env.unwrapped, "art", None)
        dt = art.config.dt if art else 0.033
        self.metadata = {
            "render.modes": ["human", "rgb_array"],
            "video.frames_per_second": 1 / dt,
        }
        self.seed(seed)
        self.backend = backend
        self._state = None

        obs_high = onp.inf * onp.ones(self._env.observation_size, dtype="float32")
        self.observation_space = spaces.Box(-obs_high, obs_high, dtype="float32")
        action_high = onp.ones(self._env.action_size, dtype="float32")
        self.action_space = spaces.Box(-action_high, action_high, dtype="float32")

        def reset(key):
            key1, key2 = jax.random.split(key)
            state = self._env.reset(key2)
            return state, state.obs, key1

        self._reset = jax.jit(reset, backend=self.backend)

        def step(state, action):
            state = self._env.step(state, action)
            info = {**state.metrics, **state.info}
            return state, state.obs, state.reward, state.done, info

        self._step = jax.jit(step, backend=self.backend)

    def reset(self, *args, **kwargs):
        self._state, obs, self._key = self._reset(self._key)
        return obs

    def step(self, action):
        self._state, obs, reward, done, info = self._step(self._state, action)
        return obs, reward, done, info

    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def render(self, mode="human"):
        from brax_tpu.io import image

        if mode == "rgb_array":
            return image.render_array(
                self._env.unwrapped.art.config, self._state.qp, 256, 256
            )
        return super().render()


class VectorGymWrapper(gym.vector.VectorEnv):
    """Exposes a batched brax_tpu Env through the Gym VectorEnv API."""

    _gym_disable_underscore_compat: ClassVar[bool] = True

    def __init__(self, env: base.Env, seed: int = 0, backend: Optional[str] = None):
        self._env = env
        art = getattr(env.unwrapped, "art", None)
        dt = art.config.dt if art else 0.033
        self.metadata = {
            "render.modes": ["human", "rgb_array"],
            "video.frames_per_second": 1 / dt,
        }
        if not hasattr(self._env, "batch_size"):
            raise ValueError("underlying env must be batched (VmapWrapper)")
        self.num_envs = self._env.batch_size
        self.seed(seed)
        self.backend = backend
        self._state = None

        obs_high = onp.inf * onp.ones(self._env.observation_size, dtype="float32")
        self.single_observation_space = spaces.Box(-obs_high, obs_high, dtype="float32")
        self.observation_space = gym_vector_utils.batch_space(
            self.single_observation_space, self.num_envs
        )
        action_high = onp.ones(self._env.action_size, dtype="float32")
        self.single_action_space = spaces.Box(-action_high, action_high, dtype="float32")
        self.action_space = gym_vector_utils.batch_space(
            self.single_action_space, self.num_envs
        )

        def reset(key):
            key1, key2 = jax.random.split(key)
            state = self._env.reset(jax.random.split(key2, self.num_envs))
            return state, state.obs, key1

        self._reset = jax.jit(reset, backend=self.backend)

        def step(state, action):
            state = self._env.step(state, action)
            info = {**state.metrics, **state.info}
            return state, state.obs, state.reward, state.done, info

        self._step = jax.jit(step, backend=self.backend)

    def reset(self, *args, **kwargs):
        self._state, obs, self._key = self._reset(self._key)
        return obs

    def step(self, action):
        self._state, obs, reward, done, info = self._step(self._state, action)
        return obs, reward, done, info

    def seed(self, seed: int = 0):
        self._key = jax.random.PRNGKey(seed)

    def render(self, mode="human"):
        from brax_tpu.io import image

        if mode == "rgb_array":
            qp = jax.tree_util.tree_map(lambda x: x[0], self._state.qp)
            return image.render_array(self._env.unwrapped.art.config, qp, 256, 256)
        return super().render()


def make_dm_env_wrapper():
    """Builds the DmEnvWrapper class (dm_env import deferred)."""
    import dm_env
    from dm_env import specs

    class DmEnvWrapper(dm_env.Environment):
        """Exposes a brax_tpu Env through the dm_env API.

        Parity: reference wrappers.py:340-428.
        """

        def __init__(self, env: base.Env, seed: int = 0, backend: Optional[str] = None):
            self._env = env
            self.seed(seed)
            self.backend = backend
            self._state = None

            obs_high = onp.inf * onp.ones(self._env.observation_size, dtype="float32")
            self._observation_spec = specs.BoundedArray(
                (self._env.observation_size,),
                minimum=-obs_high,
                maximum=obs_high,
                dtype="float32",
                name="observation",
            )
            action_high = onp.ones(self._env.action_size, dtype="float32")
            self._action_spec = specs.BoundedArray(
                (self._env.action_size,),
                minimum=-action_high,
                maximum=action_high,
                dtype="float32",
                name="action",
            )
            self._reward_spec = specs.Array(shape=(), dtype="float32", name="reward")
            self._discount_spec = specs.BoundedArray(
                shape=(), dtype="float32", minimum=0.0, maximum=1.0, name="discount"
            )

            def reset(key):
                key1, key2 = jax.random.split(key)
                state = self._env.reset(key2)
                return state, state.obs, key1

            self._reset = jax.jit(reset, backend=self.backend)

            def step(state, action):
                state = self._env.step(state, action)
                return state, state.obs, state.reward, state.done

            self._step = jax.jit(step, backend=self.backend)

        def reset(self):
            self._state, obs, self._key = self._reset(self._key)
            return dm_env.restart(obs)

        def step(self, action):
            self._state, obs, reward, done = self._step(self._state, action)
            if done:
                return dm_env.termination(reward, obs)
            return dm_env.transition(reward, obs)

        def seed(self, seed: int = 0):
            self._key = jax.random.PRNGKey(seed)

        def observation_spec(self):
            return self._observation_spec

        def action_spec(self):
            return self._action_spec

        def reward_spec(self):
            return self._reward_spec

        def discount_spec(self):
            return self._discount_spec

    return DmEnvWrapper


class JaxToTorchWrapper:
    """Wraps a Gym(Vector) wrapper so actions/observations are torch tensors.

    Parity: /root/reference/brax/envs/to_torch.py:28-66.
    """

    def __init__(self, env, device=None):
        from brax_tpu.io import torch as iotorch

        self.env = env
        self.device = device
        self._j2t = iotorch.jax_to_torch
        self._t2j = iotorch.torch_to_jax

    def __getattr__(self, name):
        return getattr(self.env, name)

    def reset(self):
        obs = self.env.reset()
        return self._j2t(obs, device=self.device)

    def step(self, action):
        action = self._t2j(action)
        obs, reward, done, info = self.env.step(action)
        obs = self._j2t(obs, device=self.device)
        reward = self._j2t(reward, device=self.device)
        done = self._j2t(done, device=self.device)
        return obs, reward, done, info
