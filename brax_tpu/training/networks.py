"""Policy / value / Q network factories.

MLPs in bfloat16-friendly flax.linen, sized to keep matmuls on the MXU when
batched over thousands of envs.

Parity: /root/reference/brax/training/networks.py:31-162.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen

from brax_tpu.training import types

ActivationFn = Callable[[jnp.ndarray], jnp.ndarray]
Initializer = Callable[..., Any]


@dataclasses.dataclass
class FeedForwardNetwork:
    init: Callable[..., Any]
    apply: Callable[..., Any]


class MLP(linen.Module):
    """Plain MLP."""

    layer_sizes: Sequence[int]
    activation: ActivationFn = linen.relu
    kernel_init: Initializer = jax.nn.initializers.lecun_uniform()
    activate_final: bool = False
    bias: bool = True

    @linen.compact
    def __call__(self, data: jnp.ndarray):
        hidden = data
        for i, hidden_size in enumerate(self.layer_sizes):
            hidden = linen.Dense(
                hidden_size,
                name=f"hidden_{i}",
                kernel_init=self.kernel_init,
                use_bias=self.bias,
            )(hidden)
            if i != len(self.layer_sizes) - 1 or self.activate_final:
                hidden = self.activation(hidden)
        return hidden


def _mlp_apply(mlp_module: "MLP", params, x):
    """MLP apply, routed through the fused Pallas fwd/bwd kernel when
    training.fused_mlp is enabled (the SGD phase is otherwise bound on
    activation HBM traffic + per-op overhead — see fused_mlp.py)."""
    from brax_tpu.training import fused_mlp

    act_name = fused_mlp.activation_name(mlp_module.activation)
    if (
        fused_mlp.enabled()
        and act_name is not None
        and not mlp_module.activate_final
        and mlp_module.bias
    ):
        kernels, biases = fused_mlp.flax_mlp_params(params)
        return fused_mlp.dense_chain(x, kernels, biases, activation=act_name)
    return mlp_module.apply(params, x)


def make_policy_network(
    param_size: int,
    obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = linen.relu,
) -> FeedForwardNetwork:
    """Policy network: obs -> distribution parameters."""
    policy_module = MLP(
        layer_sizes=list(hidden_layer_sizes) + [param_size],
        activation=activation,
        kernel_init=jax.nn.initializers.lecun_uniform(),
    )

    def apply(processor_params, policy_params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return _mlp_apply(policy_module, policy_params, obs)

    dummy_obs = jnp.zeros((1, obs_size))
    return FeedForwardNetwork(
        init=lambda key: policy_module.init(key, dummy_obs), apply=apply
    )


def make_value_network(
    obs_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = linen.relu,
) -> FeedForwardNetwork:
    """Value network: obs -> scalar."""
    value_module = MLP(
        layer_sizes=list(hidden_layer_sizes) + [1],
        activation=activation,
        kernel_init=jax.nn.initializers.lecun_uniform(),
    )

    def apply(processor_params, value_params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return jnp.squeeze(_mlp_apply(value_module, value_params, obs), axis=-1)

    dummy_obs = jnp.zeros((1, obs_size))
    return FeedForwardNetwork(
        init=lambda key: value_module.init(key, dummy_obs), apply=apply
    )


def make_q_network(
    obs_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation: ActivationFn = linen.relu,
    n_critics: int = 2,
) -> FeedForwardNetwork:
    """Twin-critic Q network: (obs, action) -> (n_critics,) values."""

    class QModule(linen.Module):
        n_critics: int

        @linen.compact
        def __call__(self, obs: jnp.ndarray, actions: jnp.ndarray):
            hidden = jnp.concatenate([obs, actions], axis=-1)
            res = []
            for _ in range(self.n_critics):
                q = MLP(
                    layer_sizes=list(hidden_layer_sizes) + [1],
                    activation=activation,
                    kernel_init=jax.nn.initializers.lecun_uniform(),
                )(hidden)
                res.append(q)
            return jnp.concatenate(res, axis=-1)

    q_module = QModule(n_critics=n_critics)

    def apply(processor_params, q_params, obs, actions):
        obs = preprocess_observations_fn(obs, processor_params)
        from brax_tpu.training import fused_mlp

        act_name = fused_mlp.activation_name(activation)
        if fused_mlp.enabled() and act_name is not None:
            # per-critic fused chains (flax auto-names the submodules MLP_i);
            # dx flows through both obs and actions — the SAC actor update
            # differentiates Q wrt the action input
            hidden = jnp.concatenate([obs, actions], axis=-1)
            res = []
            for i in range(n_critics):
                sub = {"params": q_params["params"][f"MLP_{i}"]}
                kernels, biases = fused_mlp.flax_mlp_params(sub)
                res.append(
                    fused_mlp.dense_chain(
                        hidden, kernels, biases, activation=act_name
                    )
                )
            return jnp.concatenate(res, axis=-1)
        return q_module.apply(q_params, obs, actions)

    dummy_obs = jnp.zeros((1, obs_size))
    dummy_action = jnp.zeros((1, action_size))
    return FeedForwardNetwork(
        init=lambda key: q_module.init(key, dummy_obs, dummy_action), apply=apply
    )
