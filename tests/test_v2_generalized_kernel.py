"""Parity tests for the fused generalized-pipeline Pallas kernel.

The kernel (brax_tpu/v2/generalized/kernels.py) compiles all n_frames
physics steps of the generalized pipeline into one Pallas program.  On the
CPU CI box Mosaic cannot run, so the full pallas_call executes in interpret
mode — this exercises the real kernel body, the (sublane, lane) tile
packing, and the State rebuild, not just the math.

Reference parity anchors: brax/v2/generalized/pipeline.py,
brax/v2/generalized/constraint.py:182-229 (the profiled hot spot this
kernel exists to fuse).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brax_tpu.v2.envs import ant as ant_mod
from brax_tpu.v2.generalized import kernels as gk
from brax_tpu.v2.generalized import pipeline as g_pipeline

BATCH = 128  # one lane tile


@pytest.fixture(scope="module")
def ant_env():
    return ant_mod.Ant(backend="generalized")


@pytest.fixture(scope="module")
def batched_state(ant_env):
    keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
    return jax.jit(jax.vmap(ant_env.reset))(keys).pipeline_state


def _scan_path(sys, n_frames):
    def f(state, act):
        def body(s, _):
            return g_pipeline.step(sys, s, act), None

        return jax.lax.scan(body, state, (), n_frames)[0]

    return jax.jit(jax.vmap(f, in_axes=(0, 0)))


def test_ant_supported(ant_env):
    assert gk.supported(ant_env.sys)


def test_interpret_kernel_matches_jnp_pipeline(ant_env, batched_state):
    """Full pallas_call (interpret mode) vs the vmapped jnp scan, 2 frames."""
    n_frames = 2
    sys = ant_env.sys
    rng = jax.random.PRNGKey(3)
    act = 0.3 * jax.random.normal(rng, (BATCH, ant_env.action_size))

    kstep = gk.build_pipeline_step_fn(sys, n_frames, BATCH, interpret=True)
    got = jax.jit(kstep)(batched_state, act)
    want = _scan_path(sys, n_frames)(batched_state, act)

    np.testing.assert_allclose(got.q, want.q, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got.qd, want.qd, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got.x.pos, want.x.pos, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got.x.rot, want.x.rot, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got.xd.vel, want.xd.vel, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got.xd.ang, want.xd.ang, atol=2e-4, rtol=2e-4)
    # contacts: positions + penetration refreshed from the final q
    np.testing.assert_allclose(
        got.contact.pos, want.contact.pos, atol=2e-5, rtol=2e-5
    )
    np.testing.assert_allclose(
        got.contact.penetration, want.contact.penetration, atol=2e-5, rtol=2e-5
    )


def test_interpret_kernel_multistep_stability(ant_env, batched_state):
    """Chained kernel env-steps track the jnp pipeline over 3 x 2 frames.

    The kernel's carried mass_mx_inv refreshes lazily (start of next frame)
    vs the pipeline's end-of-step refresh — chaining steps proves the carry
    semantics line up.
    """
    n_frames = 2
    sys = ant_env.sys
    kstep = jax.jit(gk.build_pipeline_step_fn(sys, n_frames, BATCH, interpret=True))
    jstep = _scan_path(sys, n_frames)

    acts = 0.2 * jax.random.normal(jax.random.PRNGKey(11), (3, BATCH, ant_env.action_size))
    got = want = batched_state
    for i in range(3):
        got = kstep(got, acts[i])
        want = jstep(want, acts[i])
    np.testing.assert_allclose(got.q, want.q, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(got.qd, want.qd, atol=2e-3, rtol=2e-3)


def test_custom_vmap_cpu_fallback(ant_env, batched_state):
    """On CPU the custom-vmap rule must take the jnp fallback branch and
    agree with the plain scan path exactly."""
    n_frames = 2
    sys = ant_env.sys
    act = 0.1 * jnp.ones((BATCH, ant_env.action_size))

    custom = gk.custom_pipeline_step_for(sys, n_frames)
    got = jax.jit(jax.vmap(custom))(batched_state, act)
    want = _scan_path(sys, n_frames)(batched_state, act)
    np.testing.assert_allclose(got.q, want.q, atol=0, rtol=0)
    np.testing.assert_allclose(got.qd, want.qd, atol=0, rtol=0)


def test_pipeline_env_dispatch_smoke(ant_env):
    """PipelineEnv.pipeline_step routes through the custom step when enabled
    and still runs (fallback path) on CPU."""
    prev = gk.enabled()
    gk.enable(True)
    try:
        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        state = jax.jit(jax.vmap(ant_env.reset))(keys)
        act = jnp.zeros((8, ant_env.action_size))
        out = jax.jit(jax.vmap(ant_env.step))(state, act)
        assert np.isfinite(np.asarray(out.obs)).all()
    finally:
        gk.enable(prev)
