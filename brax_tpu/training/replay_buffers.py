"""On-device replay buffers, mesh-sharded.

A buffer is a flat 2-D ring `data[(size, dim)]` plus insert/sample cursors —
pure arrays, so it lives on device inside the jitted training program.

Distribution model (replaces the reference's PmapWrapper/PjitWrapper,
/root/reference/brax/training/replay_buffers.py:218-354): the training loop
runs inside `shard_map` over the mesh's env/data axis, so each shard owns an
independent buffer shard of size `max_replay_size // mesh.size`, inserting
its own env shard's transitions and sampling locally — zero cross-device
traffic in the hot path.  Host-side state carries a leading device axis;
`shard_view`/`unshard_view` convert at the shard_map boundary, and
`total_size` psums the sampleable count.
"""

from __future__ import annotations

from typing import Generic, Tuple, TypeVar

import flax
import jax
import jax.numpy as jnp
from jax import flatten_util

from brax_tpu.training.types import PRNGKey

Sample = TypeVar("Sample")


@flax.struct.dataclass
class ReplayBufferState:
    """Ring buffer contents + cursors."""

    data: jnp.ndarray  # (max_size, sample_dim)
    current_position: jnp.ndarray  # ()
    current_size: jnp.ndarray  # ()
    key: PRNGKey


class QueueBase(Generic[Sample]):
    """Limited-size FIFO ring over flattened pytree samples.

    Parity: reference replay_buffers.py:61-140 (QueueBase).
    """

    def __init__(
        self,
        max_replay_size: int,
        dummy_data_sample: Sample,
        sample_batch_size: int,
    ):
        self._flatten_fn = jax.vmap(lambda x: flatten_util.ravel_pytree(x)[0])
        dummy_flat, self._unflatten = flatten_util.ravel_pytree(dummy_data_sample)
        self._unflatten_fn = jax.vmap(self._unflatten)
        self._data_shape = (max_replay_size, len(dummy_flat))
        self._data_dtype = dummy_flat.dtype
        self._sample_batch_size = sample_batch_size

    def init(self, key: PRNGKey) -> ReplayBufferState:
        return ReplayBufferState(
            data=jnp.zeros(self._data_shape, self._data_dtype),
            current_position=jnp.zeros((), jnp.int32),
            current_size=jnp.zeros((), jnp.int32),
            key=key,
        )

    def insert(self, state: ReplayBufferState, samples: Sample) -> ReplayBufferState:
        """Appends a batch of samples, evicting the oldest on overflow."""
        update = self._flatten_fn(samples)
        data = state.data
        if len(update) > len(data):
            raise ValueError(
                f"batch of {len(update)} samples exceeds max replay size {len(data)}"
            )
        # roll so the update fits contiguously after the cursor
        position = state.current_position
        roll = jnp.minimum(0, len(data) - position - len(update))
        data = jax.lax.cond(
            roll, lambda: jnp.roll(data, roll, axis=0), lambda: data
        )
        position = position + roll
        data = jax.lax.dynamic_update_slice_in_dim(data, update, position, axis=0)
        position = (position + len(update)) % len(data)
        size = jnp.minimum(state.current_size + len(update), len(data))
        return state.replace(data=data, current_position=position, current_size=size)

    def size(self, state: ReplayBufferState) -> jnp.ndarray:
        return state.current_size

    def sample(self, state: ReplayBufferState) -> Tuple[ReplayBufferState, Sample]:
        raise NotImplementedError


class Queue(QueueBase[Sample], Generic[Sample]):
    """FIFO sampling: oldest `sample_batch_size` elements, then dequeue them.

    Parity: reference replay_buffers.py:142-188.
    """

    def sample(self, state: ReplayBufferState) -> Tuple[ReplayBufferState, Sample]:
        first = state.current_position - state.current_size
        idx = jnp.arange(self._sample_batch_size) + first
        flat = jnp.take(state.data, idx, axis=0, mode="wrap")
        mask = idx < state.current_position
        mask = jnp.expand_dims(mask, axis=tuple(range(1, flat.ndim)))
        flat = flat * mask
        taken = jnp.minimum(self._sample_batch_size, state.current_size)
        new_state = state.replace(current_size=state.current_size - taken)
        return new_state, self._unflatten_fn(flat)


class UniformSamplingQueue(QueueBase[Sample], Generic[Sample]):
    """Uniform random sampling with replacement over the live window.

    Parity: reference replay_buffers.py:190-216.
    """

    def sample(self, state: ReplayBufferState) -> Tuple[ReplayBufferState, Sample]:
        key, sample_key = jax.random.split(state.key)
        idx = jax.random.randint(
            sample_key,
            (self._sample_batch_size,),
            minval=state.current_position - state.current_size,
            maxval=state.current_position,
        )
        flat = jnp.take(state.data, idx, axis=0, mode="wrap")
        return state.replace(key=key), self._unflatten_fn(flat)


# --- shard_map boundary helpers -------------------------------------------

def init_sharded(buffer: QueueBase, key: PRNGKey, device_count: int):
    """Host-side init: per-shard buffer states stacked on a leading device
    axis (shard with PartitionSpec(('i',)))."""
    keys = jax.random.split(key, device_count)
    return jax.vmap(buffer.init)(keys)


def shard_view(state):
    """Inside shard_map: strip the leading length-1 device axis."""
    return jax.tree_util.tree_map(lambda x: jnp.squeeze(x, axis=0), state)


def unshard_view(state):
    """Inside shard_map: restore the leading device axis before returning."""
    return jax.tree_util.tree_map(lambda x: x[None], state)


def total_size(state: ReplayBufferState, axis_name: str) -> jnp.ndarray:
    """Global sampleable count across shards (psum; parity:
    reference replay_buffers.py:264)."""
    return jax.lax.psum(state.current_size, axis_name)
