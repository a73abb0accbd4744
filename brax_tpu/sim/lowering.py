"""Gather/scatter lowering switch for Pallas-kernel tracing.

All body/joint/contact indices in the physics step are static (numpy) tables
baked at build time.  On the normal XLA path they lower to gather/scatter HLO
ops; Mosaic (the Pallas TPU compiler) does not support those, so when the
step is traced inside a fused Pallas kernel (see brax_tpu.sim.kernels) the
same operations must unroll into static slices and adds.  `kernel_mode`
toggles that lowering; the numeric results are identical up to float
summation order.
"""

from __future__ import annotations

import contextlib

import jax.numpy as jnp
import numpy as onp

# Mosaic scoped-VMEM cap shared by every fused kernel (sim/kernels.py and
# v2/generalized/kernels.py): many-body scenes exceed Mosaic's default 16 MB.
# Assumes a v4/v5-class chip with 128 MB of physical VMEM; earlier
# generations (v2/v3: 16/32 MB) would need this lowered.
VMEM_LIMIT_BYTES = 100 * 1024 * 1024

_KERNEL_MODE = False


@contextlib.contextmanager
def kernel_mode():
    """While active, gathers/scatters unroll into static slices/adds."""
    global _KERNEL_MODE
    prev = _KERNEL_MODE
    _KERNEL_MODE = True
    try:
        yield
    finally:
        _KERNEL_MODE = prev


def in_kernel_mode() -> bool:
    return _KERNEL_MODE


def _np_idx(idx):
    return onp.asarray(idx)


def gather_rows(x, idx):
    """x[idx] along axis 0 with clip semantics; idx static numpy."""
    if not _KERNEL_MODE:
        return jnp.take(x, idx, axis=0, mode="clip")
    idx = onp.clip(_np_idx(idx), 0, x.shape[0] - 1)
    if idx.ndim == 0:
        return x[int(idx)]
    return jnp.stack([x[int(i)] for i in idx], axis=0)


def gather_last(x, idx):
    """x[..., idx] along the last axis with clip semantics; idx static numpy
    of any shape (the result's trailing shape is idx.shape)."""
    if not _KERNEL_MODE:
        return jnp.take(x, jnp.asarray(idx), axis=-1, mode="clip")
    idx = onp.clip(_np_idx(idx), 0, x.shape[-1] - 1)
    flat = [x[..., int(i)] for i in idx.reshape(-1)]
    out = jnp.stack(flat, axis=-1)
    return out.reshape(out.shape[:-1] + idx.shape)


def scatter_add_rows(out, idx, vals):
    """out.at[idx].add(vals) along axis 0; idx static numpy (may repeat).

    Kernel mode unrolls per destination row and rebuilds with one stack, so
    per-row accumulation order follows idx order (same as XLA scatter-add)."""
    if not _KERNEL_MODE:
        return out.at[_np_idx(idx)].add(vals)
    idx = _np_idx(idx)
    rows = []
    for b in range(out.shape[0]):
        acc = out[b]
        for k in onp.nonzero(idx == b)[0]:
            acc = acc + vals[int(k)]
        rows.append(acc)
    return jnp.stack(rows, axis=0)
