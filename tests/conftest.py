"""Test config: force CPU with 8 virtual devices for sharding tests.

Must run before jax is imported anywhere.
"""

import os

# force, not setdefault: the sandbox presets JAX_PLATFORMS=axon (the remote
# TPU tunnel), which would silently route every test compile through it.
# BRAX_TPU_HW_TESTS=1 opts out, keeping the real chip so the hardware-gated
# tests (e.g. test_bitexact_bounds.py::test_tpu_bitexact_short_horizon) run.
_HW = os.environ.get("BRAX_TPU_HW_TESTS") == "1"
if not _HW:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# the sandbox's sitecustomize imports jax at interpreter startup (to register
# the axon PJRT plugin), so jax has already latched jax_platforms from the
# pre-set env; the env write above is too late — update the live config too
import jax

if not _HW:
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the CI box has one CPU core, so cold-compiling
# the whole suite dominates wall time; warm runs reuse every executable
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
