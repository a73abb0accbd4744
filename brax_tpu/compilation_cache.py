"""Persistent XLA compilation cache for brax_tpu entry points.

TPU (Mosaic) compiles of the fused physics kernels are expensive — minutes
for trainer-scale programs — but deterministic: the same program shape
always lowers to the same executable.  JAX's persistent compilation cache
turns every compile after the first ever one into a disk load, so
production jobs (and the learner CLI / benches here) pay the Mosaic
compile exactly once per program shape *per machine*, not per process.

The reference has no equivalent (it never needed one: its pure-XLA
programs compile in seconds; see /root/reference/brax/training/agents/
ppo/train.py which simply jits inline).  Here the fused whole-step Pallas
kernels (sim/kernels.py, v2/generalized/kernels.py) make cold compiles the
dominant wall-clock cost of short training runs, so the cache is enabled
by default in every CLI entry point (opt out with BRAX_TPU_NO_CACHE=1).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "brax_tpu", "xla_cache"
)

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a local directory.

    Returns the cache directory, or None if caching was disabled via the
    BRAX_TPU_NO_CACHE environment variable.  Safe to call more than once.
    """
    global _enabled
    if os.environ.get("BRAX_TPU_NO_CACHE"):
        return None
    cache_dir = (
        cache_dir
        or os.environ.get("BRAX_TPU_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that took real compile time; tiny programs stay
    # out of the cache so it doesn't fill with one-off reshapes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return cache_dir


def cache_dir() -> str | None:
    """The active cache directory, or None if not enabled."""
    if not _enabled:
        return None
    import jax

    return jax.config.jax_compilation_cache_dir
