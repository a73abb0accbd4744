"""Distributed Welford running statistics for observation normalization.

Cross-shard reduction uses `lax.psum` over a named mesh axis (works inside
shard_map), replacing the reference's pmap-axis psum.

Parity: /root/reference/brax/training/acme/running_statistics.py:38-241.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Nest = Any


@dataclasses.dataclass(frozen=True)
class ArraySpec:
    """Shape/dtype spec (replaces acme specs.Array)."""

    shape: Tuple[int, ...]
    dtype: Any = jnp.float32


@struct.dataclass
class NestedMeanStd:
    """Running (mean, std) of possibly nested data."""

    mean: Nest
    std: Nest


@struct.dataclass
class RunningStatisticsState(NestedMeanStd):
    """Full running-statistics state."""

    count: jnp.ndarray
    summed_variance: Nest


def init_state(nest: Nest) -> RunningStatisticsState:
    dtype = jnp.float32

    def zeros(x):
        return jnp.zeros(x.shape, dtype)

    def ones(x):
        return jnp.ones(x.shape, dtype)

    return RunningStatisticsState(
        count=jnp.zeros((), dtype=dtype),
        mean=jax.tree_util.tree_map(zeros, nest),
        summed_variance=jax.tree_util.tree_map(zeros, nest),
        std=jax.tree_util.tree_map(ones, nest),
    )


def update(
    state: RunningStatisticsState,
    batch: Nest,
    *,
    weights: Optional[jnp.ndarray] = None,
    std_min_value: float = 1e-6,
    std_max_value: float = 1e6,
    pmap_axis_name: Optional[str] = None,
    validate_shapes: bool = True,
) -> RunningStatisticsState:
    """Batched Welford update, optionally psum-reduced over a mesh axis."""
    assert jax.tree_util.tree_structure(batch) == jax.tree_util.tree_structure(state.mean)
    batch_shape = jax.tree_util.tree_leaves(batch)[0].shape
    batch_dims = batch_shape[: len(batch_shape) - jax.tree_util.tree_leaves(state.mean)[0].ndim]
    batch_axis = range(len(batch_dims))
    if weights is None:
        step_increment = jnp.prod(jnp.array(batch_dims))
    else:
        step_increment = jnp.sum(weights)
    if pmap_axis_name is not None:
        step_increment = jax.lax.psum(step_increment, axis_name=pmap_axis_name)
    count = state.count + step_increment

    if validate_shapes:
        if weights is not None and weights.shape != batch_dims:
            raise ValueError(f"{weights.shape} != {batch_dims}")

        def validate_node_shape(ref, b):
            expected = tuple(batch_dims) + ref.shape
            assert b.shape == expected, f"{b.shape} != {expected}"

        jax.tree_util.tree_map(validate_node_shape, state.mean, batch)

    def _compute_node_statistics(mean, summed_variance, batch):
        diff_to_old_mean = batch - mean
        if weights is not None:
            expanded = jnp.reshape(
                weights, list(weights.shape) + [1] * (batch.ndim - weights.ndim)
            )
            diff_to_old_mean = diff_to_old_mean * expanded
        mean_update = jnp.sum(diff_to_old_mean, axis=batch_axis) / count
        if pmap_axis_name is not None:
            mean_update = jax.lax.psum(mean_update, axis_name=pmap_axis_name)
        mean = mean + mean_update

        diff_to_new_mean = batch - mean
        variance_update = diff_to_old_mean * diff_to_new_mean
        variance_update = jnp.sum(variance_update, axis=batch_axis)
        if pmap_axis_name is not None:
            variance_update = jax.lax.psum(variance_update, axis_name=pmap_axis_name)
        summed_variance = summed_variance + variance_update
        return mean, summed_variance

    updated_stats = jax.tree_util.tree_map(
        _compute_node_statistics, state.mean, state.summed_variance, batch
    )
    mean = jax.tree_util.tree_map(lambda _, x: x[0], state.mean, updated_stats)
    summed_variance = jax.tree_util.tree_map(lambda _, x: x[1], state.mean, updated_stats)

    def compute_std(summed_variance, std):
        summed_variance = jnp.maximum(summed_variance, 0)
        std = jnp.sqrt(summed_variance / count)
        return jnp.clip(std, std_min_value, std_max_value)

    std = jax.tree_util.tree_map(compute_std, summed_variance, state.std)
    return RunningStatisticsState(
        count=count, mean=mean, summed_variance=summed_variance, std=std
    )


def normalize(batch: Nest, mean_std: NestedMeanStd,
              max_abs_value: Optional[float] = None) -> Nest:
    """Normalizes data using running statistics."""

    def normalize_leaf(data, mean, std):
        if not jnp.issubdtype(data.dtype, jnp.inexact):
            return data
        data = (data - mean) / std
        if max_abs_value is not None:
            data = jnp.clip(data, -max_abs_value, +max_abs_value)
        return data

    return jax.tree_util.tree_map(normalize_leaf, batch, mean_std.mean, mean_std.std)


def denormalize(batch: Nest, mean_std: NestedMeanStd) -> Nest:
    """Denormalizes values using the given mean/std."""

    def denormalize_leaf(data, mean, std):
        if not jnp.issubdtype(data.dtype, jnp.inexact):
            return data
        return data * std + mean

    return jax.tree_util.tree_map(denormalize_leaf, batch, mean_std.mean, mean_std.std)
