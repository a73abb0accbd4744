"""SGD minibatch-step anatomy, all variants scanned x32 (dispatch-free).

  full      GAE + surrogate + entropy + value loss, fwd+bwd + adam  [265us/it r5]
  no_gae    GAE replaced by precomputed advantages/targets
  no_ent    entropy term (RNG sample + tanh-normal log_prob) dropped
  nets      value+policy mean fwd+bwd + adam only                   [floor]
  gae_unroll GAE reverse scan unrolled (unroll=T)

Prints RESULT json with ms per 32-step scan and us per iteration.
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


def timed(fn, args0, n=8):
    out = fn(*args0)
    out = fn(*out[:2], args0[2])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*out[:2], args0[2])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0

    from brax_tpu import envs
    from brax_tpu.braxlines.defaults import DEFAULT_PPO_PARAMS
    from brax_tpu.envs import wrappers
    from brax_tpu.sim import kernels as sim_kernels
    from brax_tpu.training import acting, running_statistics
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
    net = ppo_networks.make_ppo_networks(
        env.observation_size, env.action_size,
        preprocess_observations_fn=running_statistics.normalize,
    )
    make_policy = ppo_networks.make_inference_fn(net)
    optimizer = optax.adam(learning_rate=cfg["learning_rate"])
    dist = net.parametric_action_distribution

    key = jax.random.PRNGKey(0)
    params = ppo_losses.PPONetworkParams(
        policy=jax.jit(net.policy_network.init)(key),
        value=jax.jit(net.value_network.init)(key),
    )
    opt_state = jax.jit(optimizer.init)(params)
    norm_params = running_statistics.init_state(
        running_statistics.ArraySpec((env.observation_size,), jnp.float32)
    )
    env_state = jax.jit(env.reset)(jax.random.split(key, num_envs))
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
        data = jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data
        )
        return jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (num_minibatches, -1) + x.shape[1:]), data
        )

    smb = roll(env_state, key)  # [32, 1024, 5, ...]

    def loss_variant(mode, gae_unroll=1):
        def loss(params, data, rng):
            d = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), data)
            logits = net.policy_network.apply(norm_params, params.policy, d.observation)
            baseline = net.value_network.apply(norm_params, params.value, d.observation)
            boot = net.value_network.apply(norm_params, params.value, d.next_observation[-1])
            if mode == "nets":
                return jnp.mean(baseline) + jnp.mean(logits) + jnp.mean(boot)
            rewards = d.reward * cfg["reward_scaling"]
            trunc = d.extras["state_extras"]["truncation"]
            term = (1 - d.discount) * (1 - trunc)
            tlp = dist.log_prob(logits, d.extras["policy_extras"]["raw_action"])
            blp = d.extras["policy_extras"]["log_prob"]
            if mode == "no_gae":
                vs = jax.lax.stop_gradient(baseline)
                adv = jax.lax.stop_gradient(rewards - baseline)
            else:
                tm = 1 - trunc
                v1 = jnp.concatenate([baseline[1:], boot[None]], axis=0)
                deltas = (rewards + cfg["discounting"] * (1 - term) * v1 - baseline) * tm

                def body(carry, t):
                    acc = carry
                    tm_t, dl, te = t
                    acc = dl + cfg["discounting"] * (1 - te) * tm_t * 0.95 * acc
                    return acc, acc

                _, vmx = jax.lax.scan(
                    body, jnp.zeros_like(boot), (tm, deltas, term),
                    reverse=True, unroll=gae_unroll,
                )
                vs = jax.lax.stop_gradient(vmx + baseline)
                v1b = jnp.concatenate([vs[1:], boot[None]], axis=0)
                adv = jax.lax.stop_gradient(
                    (rewards + cfg["discounting"] * (1 - term) * v1b - baseline) * tm
                )
            adv = (adv - adv.mean()) / (adv.std() + 1e-8)
            rho = jnp.exp(tlp - blp)
            s1 = rho * adv
            s2 = jnp.clip(rho, 0.7, 1.3) * adv
            pl = -jnp.mean(jnp.minimum(s1, s2))
            ve = vs - baseline
            vl = jnp.mean(ve * ve) * 0.25
            if mode == "no_ent":
                return pl + vl
            ent = jnp.mean(dist.entropy(logits, rng))
            return pl + vl - cfg["entropy_cost"] * ent
        return loss

    def mk_scan(loss):
        grad_fn = jax.value_and_grad(loss)

        @jax.jit
        def scan32(opt_state, params, key):
            def body(carry, d):
                o, p, k = carry
                k, kl = jax.random.split(k)
                _, g = grad_fn(p, d, kl)
                up, o = optimizer.update(g, o)
                p = optax.apply_updates(p, up)
                return (o, p, k), ()
            (o, p, k), _ = jax.lax.scan(body, (opt_state, params, key), smb)
            return o, p, k
        return scan32

    r = {}
    for name, loss in [
        ("full", loss_variant("full")),
        ("gae_unroll", loss_variant("full", gae_unroll=unroll_length)),
        ("no_gae", loss_variant("no_gae")),
        ("no_ent", loss_variant("no_ent")),
        ("nets", loss_variant("nets")),
    ]:
        ms = timed(mk_scan(loss), (opt_state, params, key)) * 1e3
        r[name + "_ms"] = round(ms, 2)
        r[name + "_us_per_iter"] = round(ms * 1000 / num_minibatches, 1)
    print("RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
