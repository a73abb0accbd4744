"""ARS linear policy network.

Parity: /root/reference/brax/training/agents/ars/networks.py:24-52.
"""

from __future__ import annotations

import jax.numpy as jnp

from brax_tpu.training import networks, types
from brax_tpu.training.types import PRNGKey

ARSNetwork = networks.FeedForwardNetwork


def make_policy_network(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
) -> ARSNetwork:
    """A single linear layer policy (the ARS paper's policy class)."""

    def apply(processor_params, policy_params, obs):
        obs = preprocess_observations_fn(obs, processor_params)
        return jnp.matmul(obs, policy_params)

    return ARSNetwork(
        init=lambda _: jnp.zeros((observation_size, action_size)), apply=apply
    )


def make_inference_fn(policy_network: ARSNetwork):
    """Creates the params -> policy function for ARS."""

    def make_policy(params: types.PolicyParams) -> types.Policy:
        def policy(observations: types.Observation, unused_key_sample: PRNGKey):
            return policy_network.apply(*params, observations), {}

        return policy

    return make_policy
