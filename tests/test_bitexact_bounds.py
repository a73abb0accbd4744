"""Bounding the bit-exactness gap vs the reference (BASELINE config 1).

Round-1 parity tests asserted tight short-horizon agreement and attributed
the long-horizon residual to XLA fusion (FMA-contraction) noise amplified
by contact chaos — but never *demonstrated* that noise floor.  These tests
close that gap:

1. A control experiment: the reference stepped against ITSELF under two
   different XLA graph arrangements (plain jit loop vs vmap(batch=1)) —
   same math, different fusion — diverges at the same order as our
   implementation does from the reference.  Measured on this box:
   ref-vs-ref(vmap1) max|dpos| ~5.6e-3 @20 steps; ours-vs-ref ~<1e-2.
2. A 1000-step, 256-env statistical parity run (the shape config 1
   specifies): per-step reward mean/std, done fraction, and torso-height
   distribution agree within tight relative tolerances even though
   individual trajectories have long since decorrelated.
   Measured: reward mean 0.6% rel, reward std 0.06%, done frac exact,
   z mean 1.3%, z std 8.2%.
3. On TPU hardware (gated): the reference is self-stable under refusion
   there (control divergence exactly 0.0 — HW_r03/tpu_noise.log), and our
   divergence from it is pinned at the measured op-order round-off bound
   (1.9e-5 @20 steps, 8.8e-5 @50) rather than claimed to be bit-exact.

Parity target: /root/reference/brax/physics/system.py:254-325.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import reference

HAVE_REF = reference.setup()

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference brax unavailable")


def test_reference_self_noise_floor():
    """The reference is not bit-stable against itself under a different XLA
    fusion arrangement; our divergence from it sits at that same noise
    floor, so the residual is platform round-off, not modeling error."""
    from brax.envs import ant as ref_ant
    from brax_tpu.envs import ant as my_ant

    ref_env = ref_ant.Ant(use_contact_forces=True)
    my_env = my_ant.Ant(use_contact_forces=True)

    rng = jax.random.PRNGKey(42)
    key = jax.random.PRNGKey(7)
    acts = []
    for _ in range(20):
        key, k = jax.random.split(key)
        acts.append(jax.random.uniform(k, (8,), minval=-1, maxval=1))

    # arrangement A: reference, plain jitted step in a python loop
    sA = jax.jit(ref_env.reset)(rng)
    step = jax.jit(ref_env.step)
    for a in acts:
        sA = step(sA, a)

    # arrangement B: reference under vmap(batch=1) — identical math, a
    # differently-shaped XLA graph, hence different FMA contraction
    sB = jax.tree_util.tree_map(lambda x: x[None], jax.jit(ref_env.reset)(rng))
    stepB = jax.jit(jax.vmap(ref_env.step))
    for a in acts:
        sB = stepB(sB, a[None])

    # ours, same action sequence
    sM = jax.jit(my_env.reset)(rng)
    mstep = jax.jit(my_env.step)
    for a in acts:
        sM = mstep(sM, a)

    pA = np.asarray(sA.qp.pos)
    pB = np.asarray(sB.qp.pos)[0]
    pM = np.asarray(sM.qp.pos)
    self_noise = np.abs(pA - pB).max()
    ours = np.abs(pA - pM).max()

    # the control must show a real noise floor (chaos amplifies the ~1e-7
    # per-step round-off to >1e-5 over 20 contact-rich steps)...
    assert self_noise > 1e-5, f"reference self-noise {self_noise:.2e}"
    # ...and our divergence must sit at that floor, not above it
    assert ours < max(10 * self_noise, 1e-3), (
        f"ours {ours:.2e} vs reference self-noise {self_noise:.2e}"
    )


def test_statistical_parity_1000step_256env():
    """Config 1's shape: 256 envs, 1000 steps, shared action stream.
    Trajectories decorrelate (chaos) but the *distributions* must match."""
    from brax.envs import create as ref_create
    from brax_tpu.envs import create as my_create

    NENV, NSTEP, CHUNK = 256, 1000, 250

    def run(create):
        env = create(
            "ant", episode_length=1000, auto_reset=True, batch_size=NENV
        )
        rng = jax.random.PRNGKey(0)
        try:
            state = jax.jit(env.reset)(rng)
        except Exception:
            state = jax.jit(env.reset)(jax.random.split(rng, NENV))

        @jax.jit
        def chunk(state, base):
            def body(s, i):
                k = jax.random.fold_in(jax.random.PRNGKey(123), base * CHUNK + i)
                a = jax.random.uniform(k, (NENV, 8), minval=-1.0, maxval=1.0)
                s = env.step(s, a)
                return s, (s.reward, s.done, s.qp.pos[:, 0, 2])
            return jax.lax.scan(body, state, jnp.arange(CHUNK))

        rews, dones, zs = [], [], []
        for b in range(NSTEP // CHUNK):
            state, (r, d, z) = chunk(state, jnp.asarray(b))
            rews.append(np.asarray(r))
            dones.append(np.asarray(d))
            zs.append(np.asarray(z))
        r = np.concatenate(rews)
        d = np.concatenate(dones)
        z = np.concatenate(zs)
        return {
            "reward_mean": r.mean(), "reward_std": r.std(),
            "done_frac": d.mean(), "z_mean": z.mean(), "z_std": z.std(),
        }

    ref = run(ref_create)
    mine = run(my_create)

    # tolerances ~4x the measured gaps (see module docstring) so seed /
    # platform drift doesn't flake, while still far below any modeling error
    assert abs(ref["reward_mean"] - mine["reward_mean"]) < 0.025 * abs(
        ref["reward_mean"]
    ) + 1e-3, (ref, mine)
    np.testing.assert_allclose(ref["reward_std"], mine["reward_std"], rtol=0.02)
    assert abs(ref["done_frac"] - mine["done_frac"]) < 0.005, (ref, mine)
    np.testing.assert_allclose(ref["z_mean"], mine["z_mean"], rtol=0.05)
    np.testing.assert_allclose(ref["z_std"], mine["z_std"], rtol=0.25)


@pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="hardware-gated: asserts the measured TPU divergence bound on a "
    "real chip (run with BRAX_TPU_HW_TESTS=1 to keep the axon platform)",
)
def test_tpu_short_horizon_divergence_bound():
    """Round 1 claimed bit-exact 20-step TPU trajectories; the r2 hardware
    capture disproved that (max|dpos| 1.9e-5 @20 steps).  The r3
    measurement (tools/measure_tpu_noise.py, HW_r03/tpu_noise.log) shows
    the reference IS self-stable on TPU under refusion (vmap(1) control
    diverges by exactly 0.0), so the residual is genuine op-order
    round-off of a ground-up rewrite, amplified by contact chaos:
    2.7e-6 @5 steps, 1.9e-5 @20, 8.8e-5 @50.  This test pins that bound
    (5x margin) instead of the false bit-exactness claim; the long-horizon
    story is the statistical parity test above."""
    from brax.envs import ant as ref_ant
    from brax_tpu.envs import ant as my_ant

    ref_env = ref_ant.Ant(use_contact_forces=True)
    my_env = my_ant.Ant(use_contact_forces=True)
    rng = jax.random.PRNGKey(42)
    rs = jax.jit(ref_env.reset)(rng)
    ms = jax.jit(my_env.reset)(rng)
    rstep, mstep = jax.jit(ref_env.step), jax.jit(my_env.step)
    # reset parity IS bit-exact (pure placement math, no chaos)
    np.testing.assert_array_equal(np.asarray(rs.qp.pos), np.asarray(ms.qp.pos))
    key = jax.random.PRNGKey(7)
    bounds = {20: 1e-4, 50: 5e-4}
    for i in range(50):
        key, k = jax.random.split(key)
        a = jax.random.uniform(k, (8,), minval=-1, maxval=1)
        rs, ms = rstep(rs, a), mstep(ms, a)
        if i + 1 in bounds:
            d = float(
                np.abs(np.asarray(rs.qp.pos) - np.asarray(ms.qp.pos)).max()
            )
            assert d < bounds[i + 1], f"step {i+1}: max|dpos| {d:.2e}"


@pytest.mark.parametrize(
    "env_name,tols",
    [
        # tolerances ~4-6x the gaps measured by tools/measure_stat_parity.py
        # (HW_r05/stat_parity.log): grasp rel reward_mean 0.8% (abs 1.6e-5),
        # fetch reward_std 2.9%, humanoid all <=0.25%
        (
            "grasp",
            dict(reward_mean_abs=1e-4, reward_std_rtol=0.01,
                 done_frac_abs=0.005, z_rtol=None),
        ),
        # fetch z stats carry ~2% run-to-run variance from the XLA fusion
        # arrangement (virtual-device count changes contraction order and
        # the 1000-step chase chaos amplifies it): z_rtol covers that band
        (
            "fetch",
            dict(reward_mean_abs=5e-4, reward_std_rtol=0.12,
                 done_frac_abs=0.005, z_rtol=0.06),
        ),
        (
            "humanoid",
            dict(reward_mean_abs=None, reward_mean_rtol=0.005,
                 reward_std_rtol=0.01, done_frac_abs=0.005, z_rtol=0.01),
        ),
    ],
)
def test_statistical_parity_contact_heavy_envs(env_name, tols):
    """VERDICT r4 item 5: the 256-env x 1000-step statistical-parity
    harness extended to the three contact-heavy envs where 3-step parity
    proves least (grasp's claw stack, fetch's chase rewards, humanoid's
    ball joints).  Shared random action stream; trajectories decorrelate,
    distributions must match.  grasp's z stats are degenerate (body 0 is
    the frozen scene root) and skipped."""
    from brax.envs import create as ref_create

    from brax_tpu.envs import create as my_create
    from tools.measure_stat_parity import run_stats

    NENV, NSTEP = 256, 1000
    ref = run_stats(ref_create, env_name, NENV, NSTEP, ref_side=True)
    mine = run_stats(my_create, env_name, NENV, NSTEP)

    if tols.get("reward_mean_abs") is not None:
        assert abs(ref["reward_mean"] - mine["reward_mean"]) < tols[
            "reward_mean_abs"
        ], (ref, mine)
    else:
        np.testing.assert_allclose(
            ref["reward_mean"], mine["reward_mean"],
            rtol=tols["reward_mean_rtol"],
        )
    np.testing.assert_allclose(
        ref["reward_std"], mine["reward_std"], rtol=tols["reward_std_rtol"]
    )
    assert abs(ref["done_frac"] - mine["done_frac"]) < tols["done_frac_abs"]
    if tols.get("z_rtol"):
        np.testing.assert_allclose(ref["z_mean"], mine["z_mean"], rtol=tols["z_rtol"])
        np.testing.assert_allclose(ref["z_std"], mine["z_std"], rtol=tols["z_rtol"])
