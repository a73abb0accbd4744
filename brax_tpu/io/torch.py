"""Zero-copy jax <-> torch tensor conversion via dlpack.

Parity: /root/reference/brax/io/torch.py:38-103.
"""

import functools
from typing import Any, Dict, Union

import jax

Device = Any


@functools.singledispatch
def torch_to_jax(value: Any) -> Any:
    """Converts torch tensors (or containers of them) to jax arrays."""
    return value


@functools.singledispatch
def jax_to_torch(value: Any, device: Device = None) -> Any:
    """Converts jax arrays (or containers of them) to torch tensors."""
    return value


def _register():
    import torch
    from torch.utils import dlpack as torch_dlpack

    @torch_to_jax.register(torch.Tensor)
    def _torch_tensor_to_jax(value: torch.Tensor):
        # both sides speak the __dlpack__ protocol directly
        return jax.dlpack.from_dlpack(value.contiguous())

    @torch_to_jax.register(dict)
    def _torch_dict_to_jax(value):
        return type(value)(**{k: torch_to_jax(v) for k, v in value.items()})

    @jax_to_torch.register(jax.Array)
    def _jax_array_to_torch(value, device: Device = None):
        try:
            tensor = torch_dlpack.from_dlpack(value)
        except BufferError:
            # TPU buffers don't speak dlpack (torch has no TPU backend);
            # bounce through host memory (zero-copy from numpy onward)
            import numpy as onp

            tensor = torch.from_numpy(onp.asarray(value))
        if device:
            return tensor.to(device=device)
        return tensor

    @jax_to_torch.register(dict)
    def _jax_dict_to_torch(value, device: Device = None):
        return type(value)(
            **{k: jax_to_torch(v, device=device) for k, v in value.items()}
        )


try:
    _register()
except ImportError:  # torch not installed: converters stay identity
    pass
