"""PPO network bundle + inference factory.

Parity: /root/reference/brax/training/agents/ppo/networks.py:27-88.
"""

from __future__ import annotations

from typing import Sequence, Tuple

from flax import linen, struct

from brax_tpu.training import distribution, networks, types
from brax_tpu.training.types import PRNGKey


@struct.dataclass
class PPONetworks:
    policy_network: networks.FeedForwardNetwork = struct.field(pytree_node=False)
    value_network: networks.FeedForwardNetwork = struct.field(pytree_node=False)
    parametric_action_distribution: distribution.ParametricDistribution = struct.field(
        pytree_node=False
    )


def make_inference_fn(ppo_networks: PPONetworks):
    """Creates the params -> policy function for the PPO agent."""

    def make_policy(params: types.PolicyParams, deterministic: bool = False) -> types.Policy:
        policy_network = ppo_networks.policy_network
        parametric_action_distribution = ppo_networks.parametric_action_distribution

        def policy(observations: types.Observation, key_sample: PRNGKey):
            logits = policy_network.apply(*params, observations)
            if deterministic:
                return parametric_action_distribution.mode(logits), {}
            raw_actions = parametric_action_distribution.sample_no_postprocessing(
                logits, key_sample
            )
            log_prob = parametric_action_distribution.log_prob(logits, raw_actions)
            postprocessed_actions = parametric_action_distribution.postprocess(raw_actions)
            return postprocessed_actions, {
                "log_prob": log_prob,
                "raw_action": raw_actions,
            }

        return policy

    return make_policy


def make_ppo_networks(
    observation_size: int,
    action_size: int,
    preprocess_observations_fn: types.PreprocessObservationFn = types.identity_observation_preprocessor,
    policy_hidden_layer_sizes: Sequence[int] = (32,) * 4,
    value_hidden_layer_sizes: Sequence[int] = (256,) * 5,
    activation=linen.swish,
) -> PPONetworks:
    """Policy (32x4) + value (256x5) swish MLPs with a NormalTanh head."""
    parametric_action_distribution = distribution.NormalTanhDistribution(
        event_size=action_size
    )
    policy_network = networks.make_policy_network(
        parametric_action_distribution.param_size,
        observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=policy_hidden_layer_sizes,
        activation=activation,
    )
    value_network = networks.make_value_network(
        observation_size,
        preprocess_observations_fn=preprocess_observations_fn,
        hidden_layer_sizes=value_hidden_layer_sizes,
        activation=activation,
    )
    return PPONetworks(
        policy_network=policy_network,
        value_network=value_network,
        parametric_action_distribution=parametric_action_distribution,
    )
