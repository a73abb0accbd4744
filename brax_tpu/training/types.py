"""Shared training types and protocols.

Parity: /root/reference/brax/training/types.py:42-85.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Mapping, NamedTuple, Tuple, TypeVar

import jax
from flax import struct

Params = Any
PRNGKey = jax.Array
Metrics = Mapping[str, jax.Array]
Observation = jax.Array
Action = jax.Array
Extra = Mapping[str, Any]
PolicyParams = Any
PreprocessorParams = Any
NetworkType = TypeVar("NetworkType")


class Transition(NamedTuple):
    """Container for a SARS'-style transition."""

    observation: jax.Array
    action: jax.Array
    reward: jax.Array
    discount: jax.Array
    next_observation: jax.Array
    extras: Dict[str, Any] = {}


Policy = Callable[[Observation, PRNGKey], Tuple[Action, Extra]]
PreprocessObservationFn = Callable[[Observation, PreprocessorParams], jax.Array]
NetworkFactory = Callable[..., NetworkType]


def identity_observation_preprocessor(observation: Observation,
                                      preprocessor_params: PreprocessorParams):
    del preprocessor_params
    return observation
