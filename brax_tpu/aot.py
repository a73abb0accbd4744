"""AOT program cache: traced+lowered (StableHLO) programs round-trip disk.

Cold-starting a trainer pays two one-off costs per program shape:

1. Python tracing + MLIR lowering — minutes for the fused-Pallas trainer
   programs, re-paid by EVERY process because XLA's persistent compilation
   cache only caches the *compile* step;
2. the XLA/Mosaic compile — already disk-cached by
   brax_tpu.compilation_cache.

`jax.export` removes the first cost: the traced program serializes to
StableHLO bytes, and a warm process deserializes + calls without ever
running the Python trace.  Measured on the v5e chip
(HW_r04/aot_{cold,warm}.log, v1-ant fused env.step @512): cold = 64 s
trace + 19.5 s compile; warm = 0.0 s deserialize + 0.6 s first call
(compilation-cache hit) + 27 ms steady-state call.

The reference has no analog (its pure-XLA programs trace in seconds); this
is the TPU-native answer to minutes-long Mosaic cold starts in production
restarts — the same role torch.compile caches / TensorRT engines play
elsewhere.

Correctness/safety model: a cache entry is keyed by a caller-supplied
fingerprint that must cover everything the traced program bakes in — scene
constants, hyperparameters, shapes, mesh — plus the jax/brax_tpu versions
and device kind (added here).  `cached_call` falls back to plain `jax.jit`
on ANY failure (serialization of exotic pytrees, export version skew,
unsupported primitives), so enabling it is never worse than not having it.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable, Optional, Tuple

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache", "brax_tpu", "aot")


def _dir(cache_dir: Optional[str]) -> Optional[str]:
    if os.environ.get("BRAX_TPU_NO_CACHE"):
        return None
    return cache_dir or os.environ.get("BRAX_TPU_AOT_DIR") or _DEFAULT_DIR


def fingerprint(*parts: Any) -> str:
    """Stable hash of reprs + the ambient jax/brax/device environment."""
    import jax

    import brax_tpu

    h = hashlib.sha256()
    for p in parts:
        h.update(repr(p).encode())
        h.update(b"\x00")
    h.update(jax.__version__.encode())
    h.update(brax_tpu.__version__.encode())
    h.update(jax.default_backend().encode())
    try:
        h.update(jax.devices()[0].device_kind.encode())
        # exported shard_map'ed programs (and (device_count, 2)-shaped key
        # inputs) bake the topology in: the same config on a different
        # slice size must be a different entry, not a call-time crash
        h.update(str(jax.device_count()).encode())
    except Exception:  # noqa: BLE001
        pass
    return h.hexdigest()[:24]


def fingerprint_callable(fn: Any) -> str:
    """Content-identifying, PROCESS-STABLE repr of a callable.

    functools.partial has no __qualname__, so the naive getattr collapses
    every partial-wrapped factory to one constant and two runs differing
    only in partial kwargs share a cache key.  Unwrap recursively — and
    fingerprint bound VALUES with the same care: a function-valued kwarg
    (e.g. activation=jax.nn.swish, the standard factory pattern) must
    hash by qualname, not by repr's memory address, or warm restarts
    would never hit the disk cache."""
    import functools

    if fn is None:
        return "None"
    if isinstance(fn, functools.partial):
        inner = fingerprint_callable(fn.func)
        args = ", ".join(_stable_repr(a) for a in fn.args)
        kw = ", ".join(
            f"{k}={_stable_repr(v)}" for k, v in sorted(fn.keywords.items())
        )
        return f"partial({inner}, args=({args}), kwargs=({kw}))"
    qn = getattr(fn, "__qualname__", None)
    if qn is not None:
        return f"{getattr(fn, '__module__', '?')}.{qn}"
    # callable object with no qualname: identify by type, not instance repr
    if callable(fn):
        t = type(fn)
        return f"instance:{t.__module__}.{t.__qualname__}"
    return repr(fn)


def _stable_repr(v: Any) -> str:
    """repr that never embeds memory addresses (callables -> qualnames,
    containers recursed)."""
    if callable(v) or v is None:
        return fingerprint_callable(v) if v is not None else "None"
    if isinstance(v, (list, tuple)):
        inner = ", ".join(_stable_repr(x) for x in v)
        return f"[{inner}]" if isinstance(v, list) else f"({inner})"
    if isinstance(v, dict):
        return (
            "{"
            + ", ".join(
                f"{k!r}: {_stable_repr(x)}" for k, x in sorted(v.items())
            )
            + "}"
        )
    r = repr(v)
    if " at 0x" in r:  # default object repr: replace the address
        t = type(v)
        return f"instance:{t.__module__}.{t.__qualname__}"
    return r


def fingerprint_pytree(tree: Any) -> str:
    """Hash of a pytree's structure and concrete leaf bytes (e.g. a System:
    two scenes differing in any parameter get different programs)."""
    import jax
    import numpy as onp

    h = hashlib.sha256()
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h.update(repr(treedef).encode())
    # one batched device_get: per-leaf onp.asarray costs a blocking
    # device->host RPC each, which over a tunneled TPU turns ~30 leaves
    # into ~15s of serial round-trips
    try:
        leaves = jax.device_get(leaves)
    except Exception:  # noqa: BLE001 - non-array leaves: hash per-leaf below
        pass
    for leaf in leaves:
        try:
            a = onp.asarray(leaf)
            h.update(str(a.shape).encode())
            h.update(str(a.dtype).encode())
            h.update(a.tobytes())
        except Exception:  # noqa: BLE001
            h.update(repr(leaf).encode())
    return h.hexdigest()[:24]


def cached_call(
    fn: Callable,
    key: str,
    example_args: Tuple,
    cache_dir: Optional[str] = None,
    donate_argnums: Tuple[int, ...] = (),
) -> Tuple[Callable, str]:
    """A jit(fn)-equivalent callable backed by the disk AOT cache.

    `example_args` must have the treedef/avals every later call will use
    (concrete arrays or ShapeDtypeStructs).  Returns (call, status) where
    status is one of 'hit' (deserialized, no tracing), 'miss' (traced,
    exported, stored), or 'fallback' (plain jax.jit; caching unavailable).

    `donate_argnums` (logical arg indices, like jax.jit's) restores buffer
    donation on the cached path: exported.call drops donation annotations
    (verified: donated inputs are NOT deleted after a deserialized call),
    so the returned callable wraps the exported program in an outer
    jax.jit carrying the donation — the outer trace is one call primitive
    (instant), its XLA compile is covered by the persistent compilation
    cache, and the peak-HBM cost of double-buffering the donated state
    (e.g. a SAC replay buffer) goes away.
    """
    import jax

    d = _dir(cache_dir)
    if d is None:
        return jax.jit(fn, donate_argnums=donate_argnums), "fallback"

    import logging

    log = logging.getLogger(__name__)
    from jax import export as jexport

    os.makedirs(d, exist_ok=True)
    safe = "".join(c if c.isalnum() or c in "-_." else "_" for c in key)
    exp_path = os.path.join(d, f"{safe}.jaxexp")
    tree_path = os.path.join(d, f"{safe}.tree")

    flat_ex, in_treedef = jax.tree_util.tree_flatten(example_args)
    # the hit-path guard must cover leaf avals, not just tree structure: a
    # key collision with matching treedef but different shapes/dtypes would
    # otherwise surface as a hard exported.call error mid-train instead of
    # the documented fall-back-to-jit behavior
    in_avals = [
        (tuple(x.shape), str(x.dtype)) if hasattr(x, "shape") else repr(x)
        for x in flat_ex
    ]
    out_cell = {}

    def flat_fn(*leaves):
        args = jax.tree_util.tree_unflatten(in_treedef, leaves)
        out = fn(*args)
        out_flat, out_treedef = jax.tree_util.tree_flatten(out)
        out_cell["treedef"] = out_treedef
        return tuple(out_flat)

    exported = out_treedef = None
    if os.path.exists(exp_path) and os.path.exists(tree_path):
        try:
            with open(exp_path, "rb") as f:
                exported = jexport.deserialize(bytearray(f.read()))
            with open(tree_path, "rb") as f:
                meta = pickle.load(f)
            out_treedef = meta["out_treedef"]
            if repr(meta["in_treedef"]) != repr(in_treedef):
                raise ValueError("input treedef changed; recompiling")
            # entries written before avals were recorded (no 'in_avals'
            # key) are treated as stale rather than trusted
            if meta.get("in_avals") != in_avals:
                raise ValueError("input avals changed; recompiling")
            status = "hit"
        except Exception as e:  # noqa: BLE001 - stale/corrupt entry
            log.warning("aot cache load failed for %s: %s", key, e)
            exported = out_treedef = None

    if exported is None:
        try:
            specs = [
                jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=getattr(x, "sharding", None))
                if hasattr(x, "shape")
                else x
                for x in flat_ex
            ]
            exported = jexport.export(jax.jit(flat_fn))(*specs)
            out_treedef = out_cell["treedef"]
            with open(exp_path + ".tmp", "wb") as f:
                f.write(exported.serialize())
            with open(tree_path + ".tmp", "wb") as f:
                pickle.dump(
                    {
                        "in_treedef": in_treedef,
                        "out_treedef": out_treedef,
                        "in_avals": in_avals,
                    },
                    f,
                )
            os.replace(exp_path + ".tmp", exp_path)
            os.replace(tree_path + ".tmp", tree_path)
            status = "miss"
        except Exception as e:  # noqa: BLE001 - export unsupported: plain jit
            log.warning("aot export failed for %s: %s", key, e)
            return jax.jit(fn, donate_argnums=donate_argnums), "fallback"

    if donate_argnums:
        # map logical arg indices to flat leaf indices for the jit wrapper
        sizes = [
            len(jax.tree_util.tree_leaves(a)) for a in example_args
        ]
        offsets = [0]
        for s in sizes:
            offsets.append(offsets[-1] + s)
        flat_donate = tuple(
            i
            for a in donate_argnums
            for i in range(offsets[a], offsets[a + 1])
        )

        def _flat_call(*leaves):
            return exported.call(*leaves)

        jit_flat_call = jax.jit(_flat_call, donate_argnums=flat_donate)

        def call(*args):
            leaves = jax.tree_util.tree_leaves(args)
            out = jit_flat_call(*leaves)
            return jax.tree_util.tree_unflatten(out_treedef, list(out))
    else:

        def call(*args):
            leaves = jax.tree_util.tree_leaves(args)
            out = exported.call(*leaves)
            return jax.tree_util.tree_unflatten(out_treedef, list(out))

    log.info("aot cache %s for %s", status, key)
    return call, status
