"""Per-env golden-value parity vs the reference simulator.

For every environment in the suite: identical reset state (bit-level) and
matching obs/reward over a short action-driven horizon.  Mirrors the
reference's own fidelity-via-reference-simulator strategy
(v2/test_utils.py:37-63).  Horizons are kept short because contact branch
flips amplify float summation-order noise chaotically (see
test_reference_parity.py for the diagnosis).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests import reference

HAVE_REF = reference.setup()

pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference brax unavailable")

# (name, ref module, ref class, my module, my class, steps, atol)
PAIRS = [
    ("acrobot", "acrobot", "Acrobot", "acrobot", "Acrobot", 10, 1e-4),
    ("halfcheetah", "half_cheetah", "Halfcheetah", "halfcheetah", "Halfcheetah", 5, 1e-3),
    ("hopper", "hopper", "Hopper", "hopper", "Hopper", 5, 1e-3),
    ("walker2d", "walker2d", "Walker2d", "walker2d", "Walker2d", 5, 1e-3),
    ("swimmer", "swimmer", "Swimmer", "swimmer", "Swimmer", 10, 1e-4),
    ("humanoid_legacy", "humanoid", "Humanoid", "humanoid", "HumanoidLegacy", 5, 1e-3),
    ("humanoidstandup", "humanoid_standup", "HumanoidStandup", "humanoid_standup", "HumanoidStandup", 5, 1e-3),
    ("reacher", "reacher", "Reacher", "reacher", "Reacher", 10, 1e-4),
    ("reacherangle", "reacherangle", "ReacherAngle", "reacherangle", "ReacherAngle", 10, 1e-4),
    ("pusher", "pusher", "Pusher", "pusher", "Pusher", 5, 1e-3),
    ("ur5e", "ur5e", "Ur5e", "ur5e", "Ur5e", 5, 1e-3),
    ("fetch", "fetch", "Fetch", "fetch", "Fetch", 3, 2e-3),
    ("grasp", "grasp", "Grasp", "grasp", "Grasp", 3, 2e-3),
    ("inverted_pendulum", "inverted_pendulum", "InvertedPendulum", "inverted_pendulum", "InvertedPendulum", 10, 1e-4),
    ("inverted_double_pendulum", "inverted_double_pendulum", "InvertedDoublePendulum", "inverted_double_pendulum", "InvertedDoublePendulum", 10, 1e-4),
]


def _make_pair(ref_mod_name, ref_cls_name, my_mod_name, my_cls_name):
    import importlib

    ref_mod = importlib.import_module(f"brax.envs.{ref_mod_name}")
    my_mod = importlib.import_module(f"brax_tpu.envs.{my_mod_name}")
    return getattr(ref_mod, ref_cls_name)(), getattr(my_mod, my_cls_name)()


@pytest.mark.parametrize(
    "name,ref_mod,ref_cls,my_mod,my_cls,steps,atol",
    PAIRS,
    ids=[p[0] for p in PAIRS],
)
def test_env_parity(name, ref_mod, ref_cls, my_mod, my_cls, steps, atol):
    ref_env, my_env = _make_pair(ref_mod, ref_cls, my_mod, my_cls)
    assert ref_env.observation_size == my_env.observation_size, "obs size"
    assert ref_env.action_size == my_env.action_size, "action size"

    rng = jax.random.PRNGKey(11)
    rs = jax.jit(ref_env.reset)(rng)
    ms = jax.jit(my_env.reset)(rng)
    np.testing.assert_allclose(
        np.asarray(rs.obs), np.asarray(ms.obs), atol=1e-6,
        err_msg=f"{name} reset obs",
    )

    rstep = jax.jit(ref_env.step)
    mstep = jax.jit(my_env.step)
    key = jax.random.PRNGKey(5)
    for i in range(steps):
        key, k = jax.random.split(key)
        a = 0.3 * jax.random.uniform(
            k, (ref_env.action_size,), minval=-1.0, maxval=1.0
        )
        rs = rstep(rs, a)
        ms = mstep(ms, a)
    # rtol covers large velocity components whose float32 round-off
    # amplifies chaotically over contact-rich steps (platform-dependent
    # FMA contraction; bit-exact on TPU, ~1e-7/step seed noise on CPU)
    np.testing.assert_allclose(
        np.asarray(rs.obs), np.asarray(ms.obs), atol=atol, rtol=3e-2,
        err_msg=f"{name} obs after {steps} steps",
    )
    np.testing.assert_allclose(
        float(rs.reward), float(ms.reward), atol=max(atol, 1e-3),
        err_msg=f"{name} reward",
    )


def test_humanoid_new_parity():
    """The fork's 'humanoid' (humanoid_new) crashes on construction in the
    reference (KeyError 'Target': humanoid_new.py:214 looks up a body that is
    commented out of its config at :1026).  Bypass its broken __init__ to
    still verify physics/obs parity against our working Humanoid."""
    from brax.envs import humanoid_new as ref_mod
    from brax_tpu.envs import humanoid as my_mod

    ref_env = object.__new__(ref_mod.Humanoid)
    import brax.envs.env as ref_env_base

    ref_env_base.Env.__init__(ref_env, config=ref_mod._SYSTEM_CONFIG)
    ref_env._forward_reward_weight = 1.25
    ref_env._ctrl_cost_weight = 0.1
    ref_env._healthy_reward = 5.0
    ref_env._terminate_when_unhealthy = True
    ref_env._healthy_z_range = (1.1, 2.0)
    ref_env._reset_noise_scale = 1e-2
    ref_env._exclude_current_positions_from_observation = True

    my_env = my_mod.Humanoid()

    rng = jax.random.PRNGKey(11)
    rs = jax.jit(ref_env.reset)(rng)
    ms = jax.jit(my_env.reset)(rng)
    np.testing.assert_allclose(np.asarray(rs.obs), np.asarray(ms.obs), atol=1e-6)

    rstep = jax.jit(ref_env.step)
    mstep = jax.jit(my_env.step)
    key = jax.random.PRNGKey(5)
    for _ in range(5):
        key, k = jax.random.split(key)
        a = 0.3 * jax.random.uniform(k, (17,), minval=-1.0, maxval=1.0)
        rs = rstep(rs, a)
        ms = mstep(ms, a)
    np.testing.assert_allclose(np.asarray(rs.obs), np.asarray(ms.obs), atol=1e-3)
