"""Tests for the AOT program cache (brax_tpu/aot.py).

Cold path: trace + export + store.  Warm path: deserialize + call with NO
Python tracing (asserted via a call counter on the wrapped function).
Fallback path: any failure degrades to plain jax.jit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu import aot


def test_cached_call_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))
    calls = {"n": 0}

    def fn(x, d):
        calls["n"] += 1
        return {"s": x + d["y"], "m": (x * d["y"], x - 1.0)}

    x = jnp.arange(6.0).reshape(2, 3)
    d = {"y": jnp.ones((2, 3))}

    call1, status1 = aot.cached_call(fn, "unit_roundtrip", (x, d))
    assert status1 == "miss"
    out1 = call1(x, d)
    assert calls["n"] == 1  # traced exactly once

    call2, status2 = aot.cached_call(fn, "unit_roundtrip", (x, d))
    assert status2 == "hit"
    out2 = call2(x, d)
    assert calls["n"] == 1  # warm path never ran the Python body

    np.testing.assert_array_equal(np.asarray(out1["s"]), np.asarray(out2["s"]))
    np.testing.assert_array_equal(
        np.asarray(out1["m"][0]), np.asarray(out2["m"][0])
    )
    assert out2["s"].shape == (2, 3)


def test_cached_call_treedef_change_recompiles(tmp_path, monkeypatch):
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))

    def fn(x):
        return jax.tree_util.tree_map(lambda v: v * 2.0, x)

    x = jnp.ones((4,))
    _, s1 = aot.cached_call(fn, "unit_treedef", (x,))
    assert s1 == "miss"
    # same key, different input structure: must not serve the stale entry
    call, s2 = aot.cached_call(fn, "unit_treedef", ({"a": x},))
    assert s2 in ("miss", "fallback")
    out = call({"a": x})
    np.testing.assert_array_equal(np.asarray(out["a"]), 2.0 * np.ones((4,)))


def test_cached_call_aval_change_recompiles(tmp_path, monkeypatch):
    """Same key + same treedef but different leaf shapes/dtypes must be a
    miss (re-export), not a hard error at exported.call time."""
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))

    def fn(x):
        return x * 2.0

    _, s1 = aot.cached_call(fn, "unit_avals", (jnp.ones((4,)),))
    assert s1 == "miss"
    call, s2 = aot.cached_call(fn, "unit_avals", (jnp.ones((8,)),))
    assert s2 in ("miss", "fallback")
    out = call(jnp.ones((8,)))
    np.testing.assert_array_equal(np.asarray(out), 2.0 * np.ones((8,)))
    # dtype-only change is likewise detected
    call, s3 = aot.cached_call(fn, "unit_avals", (jnp.ones((8,), jnp.bfloat16),))
    assert s3 in ("miss", "fallback")


def test_fingerprint_callable_distinguishes_partials():
    import functools

    def factory(obs, act, *, width=32, activation="swish"):
        return (obs, act, width, activation)

    a = functools.partial(factory, width=64)
    b = functools.partial(factory, width=128)
    c = functools.partial(factory, activation="relu")
    fps = {aot.fingerprint_callable(f) for f in (factory, a, b, c)}
    assert len(fps) == 4  # no two collapse to one key
    # nested partials unwrap recursively
    d = functools.partial(a, activation="tanh")
    assert aot.fingerprint_callable(d) != aot.fingerprint_callable(a)
    # stable across calls, None passes through
    assert aot.fingerprint_callable(a) == aot.fingerprint_callable(
        functools.partial(factory, width=64)
    )
    assert aot.fingerprint_callable(None) == "None"


def test_cached_call_donation(tmp_path, monkeypatch):
    """donate_argnums on the cached path: correct outputs both cold and
    warm; on TPU the donated input buffer is actually freed (CPU ignores
    donation, so the deletion assert is hardware-gated)."""
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))

    def fn(state, key):
        return jax.tree_util.tree_map(lambda v: v * 2.0, state), key + 1

    state = {"a": jnp.ones((8, 8)), "b": jnp.zeros((3,))}
    key = jnp.zeros(())
    for expect in ("miss", "hit"):
        call, status = aot.cached_call(
            fn, "unit_donate", (state, key), donate_argnums=(0,)
        )
        assert status == expect
        st = {"a": jnp.ones((8, 8)), "b": jnp.zeros((3,))}
        out, k2 = call(st, key)
        np.testing.assert_array_equal(np.asarray(out["a"]), 2.0 * np.ones((8, 8)))
        if jax.default_backend() == "tpu":
            jax.block_until_ready(out)
            assert st["a"].is_deleted()


def test_cached_call_disabled_env(tmp_path, monkeypatch):
    monkeypatch.setenv("BRAX_TPU_NO_CACHE", "1")
    call, status = aot.cached_call(lambda x: x + 1, "unit_disabled", (jnp.ones(3),))
    assert status == "fallback"
    np.testing.assert_array_equal(np.asarray(call(jnp.ones(3))), 2.0)


def test_fingerprint_pytree_sensitivity():
    a = {"w": jnp.ones((2, 2)), "b": 3}
    b = {"w": jnp.ones((2, 2)), "b": 3}
    c = {"w": 2.0 * jnp.ones((2, 2)), "b": 3}
    assert aot.fingerprint_pytree(a) == aot.fingerprint_pytree(b)
    assert aot.fingerprint_pytree(a) != aot.fingerprint_pytree(c)


@pytest.mark.filterwarnings("ignore")
def test_ppo_fast_env_aot_cache(tmp_path, monkeypatch):
    """PPO on the `fast` env with aot_cache=True completes and learns shape;
    a second train() call in the same process reuses the on-disk programs
    (or falls back transparently on platforms export cannot handle)."""
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))
    from brax_tpu import envs
    from brax_tpu.training.agents.ppo import train as ppo

    kwargs = dict(
        num_timesteps=2048,
        episode_length=128,
        num_envs=16,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        discounting=0.95,
        unroll_length=5,
        batch_size=16,
        num_minibatches=4,
        num_updates_per_batch=1,
        num_evals=2,
        num_eval_envs=16,
        normalize_observations=True,
        seed=0,
        aot_cache=True,
    )
    for _ in range(2):
        make_policy, params, metrics = ppo.train(
            environment=envs.create("fast", auto_reset=False), **kwargs
        )
        assert np.isfinite(metrics["eval/episode_reward"])


@pytest.mark.filterwarnings("ignore")
def test_sac_fast_env_aot_cache(tmp_path, monkeypatch):
    """SAC with aot_cache=True: cold run exports reset/prefill/epoch/eval
    programs, warm run deserializes them; both complete with finite eval
    reward (or fall back transparently)."""
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))
    from brax_tpu import envs
    from brax_tpu.training.agents.sac import train as sac

    kwargs = dict(
        num_timesteps=1024,
        episode_length=64,
        num_envs=8,
        batch_size=16,
        min_replay_size=64,
        max_replay_size=1024,
        grad_updates_per_step=1,
        learning_rate=3e-4,
        discounting=0.95,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
        aot_cache=True,
    )
    for _ in range(2):
        make_policy, params, metrics = sac.train(
            environment=envs.create("fast", auto_reset=False), **kwargs
        )
        assert np.isfinite(metrics["eval/episode_reward"])


@pytest.mark.filterwarnings("ignore")
def test_es_fast_env_aot_cache(tmp_path, monkeypatch):
    """ES (representative of the population trainers — ARS and APG share
    the same single-epoch-program integration) with aot_cache=True: cold
    exports, warm deserializes, finite rewards both times."""
    monkeypatch.setenv("BRAX_TPU_AOT_DIR", str(tmp_path))
    from brax_tpu import envs
    from brax_tpu.training.agents.es import train as es

    kwargs = dict(
        num_timesteps=256,
        episode_length=16,
        population_size=8,
        learning_rate=1e-2,
        perturbation_std=0.1,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
        aot_cache=True,
    )
    for _ in range(2):
        make_policy, params, metrics = es.train(
            environment=envs.create("fast", auto_reset=False), **kwargs
        )
        assert np.isfinite(metrics["eval/episode_reward"])
