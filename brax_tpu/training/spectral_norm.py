"""Spectral-normalized Dense layer (power iteration).

Used by discriminator networks (GAIL/DIAYN-style, see experimental
braxlines).  Parity: /root/reference/brax/training/spectral_norm.py:30-133.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen

PRNGKey = Any
Shape = Tuple[int, ...]
Dtype = Any
Array = Any

default_kernel_init = linen.initializers.lecun_normal()


class SNDense(linen.Module):
    """A linear transformation with spectral normalization.

    The kernel is divided by its largest singular value, estimated by
    `n_steps` of power iteration with persistent u/v state variables.
    """

    features: int
    use_bias: bool = True
    dtype: Any = jnp.float32
    precision: Any = None
    kernel_init: Callable[[PRNGKey, Shape, Dtype], Array] = default_kernel_init
    bias_init: Callable[[PRNGKey, Shape, Dtype], Array] = linen.initializers.zeros
    eps: float = 1e-4
    n_steps: int = 1

    @linen.compact
    def __call__(self, inputs: Array) -> Array:
        inputs = jnp.asarray(inputs, self.dtype)
        kernel = self.param(
            "kernel", self.kernel_init, (inputs.shape[-1], self.features)
        )
        kernel = jnp.asarray(kernel, self.dtype)
        kernel_shape = kernel.shape
        kernel_2d = kernel.reshape(-1, kernel_shape[-1])

        u0_state = self.variable(
            "sing_vec",
            "u0",
            lambda k: jax.random.normal(k, (1, kernel_2d.shape[-1])),
            self.make_rng("sing_vec") if self.has_rng("sing_vec") else jax.random.PRNGKey(0),
        )
        u0 = u0_state.value

        # power iteration for the leading singular value
        for _ in range(self.n_steps):
            v0 = _l2_normalize(
                jnp.matmul(u0, kernel_2d.transpose([1, 0])), eps=self.eps
            )
            u0 = _l2_normalize(jnp.matmul(v0, kernel_2d), eps=self.eps)

        u0 = jax.lax.stop_gradient(u0)
        v0 = jax.lax.stop_gradient(v0)
        sigma = jnp.matmul(jnp.matmul(v0, kernel_2d), jnp.transpose(u0))[0, 0]
        kernel = kernel / (sigma + self.eps)

        if not self.is_initializing():
            u0_state.value = u0

        y = jax.lax.dot_general(
            inputs,
            kernel,
            (((inputs.ndim - 1,), (0,)), ((), ())),
            precision=self.precision,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + jnp.asarray(bias, self.dtype)
        return y


def _l2_normalize(x, axis=None, eps=1e-12):
    return x * jax.lax.rsqrt((x * x).sum(axis=axis, keepdims=True) + eps)
