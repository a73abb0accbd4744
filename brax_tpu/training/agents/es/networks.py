"""ES network bundle + inference factory.

Parity: /root/reference/brax/training/agents/es/networks.py:27-69.
"""

from __future__ import annotations

from typing import Sequence

from flax import linen, struct

from brax_tpu.training import distribution, networks, types
from brax_tpu.training.types import PRNGKey


@struct.dataclass
class ESNetworks:
    policy_network: networks.FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: distribution.ParametricDistribution = struct.field(
        pytree_node=False
    )


def make_inference_fn(es_networks: ESNetworks):
    """Creates the params -> policy function for the ES agent."""

    def make_policy(params: types.PolicyParams, deterministic: bool = False) -> types.Policy:
        def policy(observations: types.Observation, key_sample: PRNGKey):
            logits = es_networks.policy_network.apply(*params, observations)
            if deterministic:
                return es_networks.parametric_action_distribution.mode(logits), {}
            return (
                es_networks.parametric_action_distribution.sample(logits, key_sample),
                {},
            )

        return policy

    return make_policy


def make_es_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    hidden_layer_sizes: Sequence[int] = (32,) * 4,
    activation=linen.relu,
) -> ESNetworks:
    """Policy MLP with a NormalTanh head."""
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
    return ESNetworks(
        policy_network=policy_network,
        parametric_action_distribution=parametric_action_distribution,
    )
