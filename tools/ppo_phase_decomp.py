"""Per-phase walltime + flops decomposition of one PPO training step on HW.

VERDICT r4 weak item 1: the headline bench is rollout-only while the actual
PPO solve runs ~1.6M env-steps/s — nothing says where the other ~80% of the
chip time goes.  This tool jits each phase of the ant-preset training step
as its own program and times them warm on the chip:

  rollout   scan of generate_unroll x (batch*minibatches/num_envs)
            [policy MLP forward + fused physics kernel]
  reshape   (T-major -> sample-major) swapaxes + flatten of the data batch
  norm      running_statistics.update over the batch observations
  sgd       scan num_updates_per_batch x [shuffle + scan num_minibatches x
            (GAE + PPO loss fwd+bwd + adam)]   <- the value/policy matmuls
  full      the whole training_step (cross-check: ~= sum of the above)

plus the flops of each phase from XLA cost analysis (fused kernel disabled
for the analysis pass so physics flops count the algorithmic work, mirroring
bench.py), and the epoch-level eval cost.

Writes one RESULT json line; log under HW_r05/.

Usage: python tools/ppo_phase_decomp.py [num_envs=2048]
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from brax_tpu.compilation_cache import enable_compilation_cache


def timed(fn, chain, n=8):
    """Warm walltime per call: `chain(prev_out) -> args` makes calls
    dependent so the tunnel cannot overlap them; one scalar fetch syncs."""
    out = fn(*chain(None))
    out = fn(*chain(out))  # second compile shape (outputs as inputs)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*chain(out))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def flops_of(fn, *args):
    try:
        c = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c["flops"])
    except Exception as e:  # noqa: BLE001
        print(f"cost analysis failed: {e!r}", file=sys.stderr)
        return float("nan")


def main():
    num_envs = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    enable_compilation_cache()

    t_dev = time.time()
    assert float(jnp.ones(8).sum()) == 8.0
    print(f"device ready after {time.time()-t_dev:.1f}s", flush=True)

    from brax_tpu import envs
    from brax_tpu.braxlines.defaults import DEFAULT_PPO_PARAMS
    from brax_tpu.envs import wrappers
    from brax_tpu.sim import kernels as sim_kernels
    from brax_tpu.training import acting, gradients, running_statistics
    from brax_tpu.training.agents.ppo import losses as ppo_losses
    from brax_tpu.training.agents.ppo import networks as ppo_networks

    cfg = dict(DEFAULT_PPO_PARAMS["ant"])
    episode_length = cfg["episode_length"]
    unroll_length = cfg["unroll_length"]
    batch_size = cfg["batch_size"]
    num_minibatches = cfg["num_minibatches"]
    num_updates_per_batch = cfg["num_updates_per_batch"]
    sim_kernels.enable(jax.default_backend() == "tpu")
    import os

    from brax_tpu.training import fused_mlp

    fused_mlp.enable(os.environ.get("FUSED_MLP", "0") == "1")

    env = wrappers.wrap_for_training_any(
        envs._envs["ant"](), episode_length=episode_length, action_repeat=1
    )
    normalize = running_statistics.normalize
    ppo_network = ppo_networks.make_ppo_networks(
        env.observation_size, env.action_size, preprocess_observations_fn=normalize
    )
    make_policy = ppo_networks.make_inference_fn(ppo_network)
    import optax

    optimizer = optax.adam(learning_rate=cfg["learning_rate"])
    loss_fn = functools.partial(
        ppo_losses.compute_ppo_loss,
        ppo_network=ppo_network,
        entropy_cost=cfg["entropy_cost"],
        discounting=cfg["discounting"],
        reward_scaling=cfg["reward_scaling"],
        gae_lambda=0.95,
        clipping_epsilon=0.3,
        normalize_advantage=True,
    )
    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=None, has_aux=True
    )

    key = jax.random.PRNGKey(0)
    params = ppo_losses.PPONetworkParams(
        policy=jax.jit(ppo_network.policy_network.init)(key),
        value=jax.jit(ppo_network.value_network.init)(key),
    )
    opt_state = jax.jit(optimizer.init)(params)
    norm_params = running_statistics.init_state(
        running_statistics.ArraySpec((env.observation_size,), jnp.float32)
    )
    env_state = jax.jit(env.reset)(jax.random.split(key, num_envs))

    n_unrolls = batch_size * num_minibatches // num_envs
    env_steps_per_training_step = batch_size * unroll_length * num_minibatches

    # --- phase programs -------------------------------------------------
    @jax.jit
    def p_rollout(state, norm_params, params, key):
        policy = make_policy((norm_params, params.policy))

        def f(carry, unused_t):
            s, k = carry
            k, nk = jax.random.split(k)
            ns, data = acting.generate_unroll(
                env, s, policy, k, unroll_length, extra_fields=("truncation",)
            )
            return (ns, nk), data

        (state, _), data = jax.lax.scan(f, (state, key), (), length=n_unrolls)
        return state, data

    @jax.jit
    def p_reshape(data):
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        return jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data
        )

    @jax.jit
    def p_norm(norm_params, obs):
        return running_statistics.update(norm_params, obs, pmap_axis_name=None)

    def minibatch_step(carry, data, normalizer_params):
        opt_state, params, key = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, opt_state = gradient_update_fn(
            params, normalizer_params, data, key_loss, optimizer_state=opt_state
        )
        return (opt_state, params, key), metrics

    def sgd_step(carry, unused_t, data, normalizer_params):
        opt_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert(x):
            x = jax.random.permutation(key_perm, x)
            return jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])

        shuffled = jax.tree_util.tree_map(convert, data)
        (opt_state, params, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step, normalizer_params=normalizer_params),
            (opt_state, params, key_grad),
            shuffled,
            length=num_minibatches,
        )
        return (opt_state, params, key), metrics

    @jax.jit
    def p_sgd(opt_state, params, norm_params, data, key):
        (opt_state, params, _), metrics = jax.lax.scan(
            functools.partial(sgd_step, data=data, normalizer_params=norm_params),
            (opt_state, params, key),
            (),
            length=num_updates_per_batch,
        )
        return opt_state, params

    @jax.jit
    def p_full(opt_state, params, norm_params, state, key):
        key_sgd, key_roll = jax.random.split(key)
        state, data = p_rollout(state, norm_params, params, key_roll)
        data = p_reshape(data)
        norm_params = p_norm(norm_params, data.observation)
        opt_state, params = p_sgd(opt_state, params, norm_params, data, key_sgd)
        return opt_state, params, norm_params, state

    # --- timings --------------------------------------------------------
    print("compiling + timing phases (warm):", flush=True)
    r = {}

    def chain_rollout(prev):
        s = env_state if prev is None else prev[0]
        return (s, norm_params, params, jax.random.fold_in(key, 1))

    r["rollout_s"] = timed(p_rollout, chain_rollout)
    _, data0 = p_rollout(env_state, norm_params, params, key)

    def chain_reshape(prev):
        return (data0,)

    r["reshape_s"] = timed(p_reshape, chain_reshape)
    flat = p_reshape(data0)

    def chain_norm(prev):
        np_ = norm_params if prev is None else prev
        return (np_, flat.observation)

    r["norm_s"] = timed(p_norm, chain_norm)

    def chain_sgd(prev):
        o, p = (opt_state, params) if prev is None else prev
        return (o, p, norm_params, flat, jax.random.fold_in(key, 2))

    r["sgd_s"] = timed(p_sgd, chain_sgd, n=4)

    def chain_full(prev):
        if prev is None:
            return (opt_state, params, norm_params, env_state, key)
        o, p, np_, s = prev
        return (o, p, np_, s, jax.random.fold_in(key, 3))

    r["full_s"] = timed(p_full, chain_full, n=4)

    # --- flops (algorithmic: fused kernel off for the analysis pass) ----
    sim_kernels.enable(False)
    f_rollout = flops_of(p_rollout._fun if hasattr(p_rollout, "_fun") else p_rollout,
                         env_state, norm_params, params, key)
    sim_kernels.enable(jax.default_backend() == "tpu")
    f_sgd = flops_of(p_sgd, opt_state, params, norm_params, flat, key)
    f_norm = flops_of(p_norm, norm_params, flat.observation)

    per = env_steps_per_training_step
    out = {
        "num_envs": num_envs,
        "env_steps_per_training_step": per,
        **{k: round(v, 5) for k, v in r.items()},
        "sum_phases_s": round(r["rollout_s"] + r["reshape_s"] + r["norm_s"] + r["sgd_s"], 5),
        "e2e_env_steps_per_s": round(per / r["full_s"]),
        "rollout_flops_per_env_step": round(f_rollout / per),
        "sgd_flops_per_env_step": round(f_sgd / per),
        "norm_flops_per_env_step": round(f_norm / per),
        "phase_pct": {
            k: round(100 * r[k] / r["full_s"], 1)
            for k in ("rollout_s", "reshape_s", "norm_s", "sgd_s")
        },
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
