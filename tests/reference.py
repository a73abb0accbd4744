"""Imports the reference brax (at /root/reference) for golden-value tests.

The reference targets an older JAX; this installs small compatibility shims
(absent third-party modules it imports but that our tests never exercise, and
two renamed jax internals).  Tests using this module must skip gracefully when
the reference isn't present.
"""

import sys
import types
import warnings

AVAILABLE = False


def _mod(name, **attrs):
    """Installs a stub module ONLY if the real one isn't importable (a real
    dm_env/gymnasium must keep working for the interop tests that share the
    pytest process)."""
    try:
        import importlib

        return importlib.import_module(name)
    except Exception:  # noqa: BLE001
        pass
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules[name] = m
    return m


def setup():
    global AVAILABLE
    if AVAILABLE:
        return True
    try:
        _mod("trimesh")
        _mod("trimesh.exchange")
        _mod("trimesh.exchange.load", load_mesh=lambda *a, **k: None)
        _mod("jax.experimental.host_callback", call=lambda *a, **k: None)
        gym = _mod("gym", Env=object, Space=object)
        gym.spaces = _mod("gym.spaces", Box=object)
        gym.vector = _mod("gym.vector", VectorEnv=object)
        gym.vector.utils = _mod("gym.vector.utils", batch_space=lambda *a, **k: None)
        _mod("dm_env", Environment=object, TimeStep=None, StepType=None)
        _mod("dm_env.specs", Array=object, BoundedArray=object)

        import jax
        import jax.interpreters.batching as batching
        from jax._src.interpreters import batching as _b

        batching.__dict__["BatchTracer"] = _b.BatchTracer

        # jax.experimental.maps was removed; the reference only uses
        # maps.Mesh as a type annotation (replay_buffers.py:24,283)
        _mod("jax.experimental.maps", Mesh=jax.sharding.Mesh)

        # pjit.PartitionSpec moved to jax.sharding (the reference reads it
        # at class-definition time, replay_buffers.py:285,321)
        from jax.experimental import pjit as _pjit

        if not hasattr(_pjit, "PartitionSpec"):
            _pjit.PartitionSpec = jax.sharding.PartitionSpec

        import jax._src.core as _core

        class _FakeSublevel:
            @property
            def level(self):
                return 0 if _core.trace_state_clean() else 1

        jax.core.__dict__["cur_sublevel"] = lambda: _FakeSublevel()

        sys.path.insert(0, "/root/reference")
        warnings.filterwarnings("ignore")
        import brax  # noqa: F401

        AVAILABLE = True
    except Exception:  # noqa: BLE001
        AVAILABLE = False
    return AVAILABLE
