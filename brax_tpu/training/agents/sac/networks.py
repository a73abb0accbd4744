"""SAC network bundle + inference factory.

Parity: /root/reference/brax/training/agents/sac/networks.py:27-82.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen, struct

from brax_tpu.training import distribution, networks, types
from brax_tpu.training.types import PRNGKey


@struct.dataclass
class SACNetworks:
    policy_network: networks.FeedForwardNetwork = struct.field(pytree_node=False)
    q_network: networks.FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: distribution.ParametricDistribution = struct.field(
        pytree_node=False
    )


def make_inference_fn(sac_networks: SACNetworks):
    """Creates the params -> policy function for the SAC agent."""

    def make_policy(params: types.PolicyParams, deterministic: bool = False) -> types.Policy:
        def policy(observations: types.Observation, key_sample: PRNGKey):
            logits = sac_networks.policy_network.apply(*params, observations)
            if deterministic:
                return sac_networks.parametric_action_distribution.mode(logits), {}
            return (
                sac_networks.parametric_action_distribution.sample(logits, key_sample),
                {},
            )

        return policy

    return make_policy


def make_sac_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (256, 256),
    activation=linen.relu,
) -> SACNetworks:
    """Policy + twin-Q relu MLPs with a NormalTanh head."""
    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    policy_network = networks.make_policy_network(
        parametric_action_distribution.param_size,
        observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=hidden_layer_sizes,
        activation=activation,
    )
    q_network = networks.make_q_network(
        observation_size,
        action_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=hidden_layer_sizes,
        activation=activation,
    )
    return SACNetworks(
        policy_network=policy_network,
        q_network=q_network,
        parametric_action_distribution=parametric_action_distribution,
    )
