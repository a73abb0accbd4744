"""Dissect the PPO SGD phase: where do 325us/minibatch-step go?

Measures, warm on the chip, per-call time of:
  (a) full minibatch_step (GAE + PPO loss fwd+bwd + adam)       [baseline]
  (b) nets-only fwd+bwd: mean(value(obs)) + mean(policy(obs))    [matmul roof]
  (c) minibatch scan with unroll=1 vs unroll=8                   [loop overhead]
  (d) shuffle (permutation gather) alone                         [data movement]
  (e) (b) under jax.default_matmul_precision('float32')          [precision check]

Prints RESULT json.  Usage: python tools/ppo_sgd_dissect.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from brax_tpu.compilation_cache import enable_compilation_cache


def timed(fn, chain, n=16):
    out = fn(*chain(None))
    out = fn(*chain(out))
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*chain(out))
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0

    from brax_tpu import envs
    from brax_tpu.braxlines.defaults import DEFAULT_PPO_PARAMS
    from brax_tpu.envs import wrappers
    from brax_tpu.training import acting, gradients, running_statistics
    from brax_tpu.sim import kernels as sim_kernels
    from brax_tpu.training.agents.ppo import losses as ppo_losses
    from brax_tpu.training.agents.ppo import networks as ppo_networks

    cfg = dict(DEFAULT_PPO_PARAMS["ant"])
    num_envs = 2048
    unroll_length = cfg["unroll_length"]
    batch_size = cfg["batch_size"]
    num_minibatches = cfg["num_minibatches"]
    sim_kernels.enable(jax.default_backend() == "tpu")

    env = wrappers.wrap_for_training_any(
        envs._envs["ant"](), episode_length=cfg["episode_length"], action_repeat=1
    )
    ppo_network = ppo_networks.make_ppo_networks(
        env.observation_size, env.action_size,
        preprocess_observations_fn=running_statistics.normalize,
    )
    make_policy = ppo_networks.make_inference_fn(ppo_network)
    optimizer = optax.adam(learning_rate=cfg["learning_rate"])
    loss_fn = functools.partial(
        ppo_losses.compute_ppo_loss, ppo_network=ppo_network,
        entropy_cost=cfg["entropy_cost"], discounting=cfg["discounting"],
        reward_scaling=cfg["reward_scaling"], gae_lambda=0.95,
        clipping_epsilon=0.3, normalize_advantage=True,
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

    # one rollout to get real data
    policy = make_policy((norm_params, params.policy))

    @jax.jit
    def roll(state, key):
        def f(carry, _):
            s, k = carry
            k, nk = jax.random.split(k)
            ns, data = acting.generate_unroll(
                env, s, policy, k, unroll_length, extra_fields=("truncation",)
            )
            return (ns, nk), data
        (_, _), data = jax.lax.scan(
            f, (state, key), (), length=batch_size * num_minibatches // num_envs
        )
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        return jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data
        )
    data = roll(env_state, key)
    mb = jax.tree_util.tree_map(
        lambda x: x[: x.shape[0] // num_minibatches], data
    )
    obs = mb.observation  # [1024, 5, obs]
    r = {}

    # (a) one minibatch_step
    @jax.jit
    def one_mb(opt_state, params, key):
        key, kl = jax.random.split(key)
        (_, m), params, opt_state = gradient_update_fn(
            params, norm_params, mb, kl, optimizer_state=opt_state
        )
        return opt_state, params, key

    r["minibatch_step_us"] = timed(
        one_mb, lambda p: (opt_state, params, key) if p is None else p
    ) * 1e6

    # (b) nets-only fwd+bwd on the same obs shapes
    def nets_loss(params, obs):
        v = ppo_network.value_network.apply(norm_params, params.value, obs)
        logits = ppo_network.policy_network.apply(norm_params, params.policy, obs)
        return jnp.mean(v) + jnp.mean(logits)

    nets_grad = jax.jit(jax.grad(nets_loss))

    r["nets_fwdbwd_us"] = timed(
        nets_grad, lambda p: (params, obs) if p is None else (p, obs)
    ) * 1e6

    # (e) same under forced float32 (3/6-pass) precision
    with jax.default_matmul_precision("float32"):
        nets_grad_f32 = jax.jit(jax.grad(nets_loss))
        r["nets_fwdbwd_f32prec_us"] = timed(
            nets_grad_f32, lambda p: (params, obs) if p is None else (p, obs)
        ) * 1e6

    # (c) scan of 32 minibatch steps, unroll 1 vs 8
    smb = jax.tree_util.tree_map(
        lambda x: jnp.reshape(x, (num_minibatches, -1) + x.shape[1:]), data
    )

    def mk_scan(unroll):
        @jax.jit
        def scan32(opt_state, params, key):
            def body(carry, d):
                o, p, k = carry
                k, kl = jax.random.split(k)
                (_, m), p, o = gradient_update_fn(
                    p, norm_params, d, kl, optimizer_state=o
                )
                return (o, p, k), ()
            (o, p, k), _ = jax.lax.scan(
                body, (opt_state, params, key), smb, unroll=unroll
            )
            return o, p, k
        return scan32

    for u in (1, 8):
        r[f"scan32_unroll{u}_ms"] = timed(
            mk_scan(u),
            lambda p: (opt_state, params, key) if p is None else p,
            n=8,
        ) * 1e3

    # (d) shuffle alone
    @jax.jit
    def shuffle(data, key):
        def convert(x):
            x = jax.random.permutation(key, x)
            return jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])
        return jax.tree_util.tree_map(convert, data)

    r["shuffle_ms"] = timed(
        shuffle, lambda p: (data, key), n=8
    ) * 1e3

    # analytic matmul flops per minibatch step (fwd + ~2x bwd)
    o, a = env.observation_size, env.action_size
    samples = batch_size * unroll_length
    vf = 2 * (o * 256 + 4 * 256 * 256 + 256)
    pf = 2 * (o * 32 + 3 * 32 * 32 + 32 * 2 * a)
    r["analytic_matmul_gflops_per_mb"] = round(3 * samples * (vf + pf) / 1e9, 2)
    r["achieved_tflops_nets"] = round(
        3 * samples * (vf + pf) / (r["nets_fwdbwd_us"] / 1e6) / 1e12, 2
    )
    print("RESULT " + json.dumps({k: round(v, 2) if isinstance(v, float) else v
                                  for k, v in r.items()}))


if __name__ == "__main__":
    main()
