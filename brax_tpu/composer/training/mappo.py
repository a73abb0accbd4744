"""Multi-agent PPO on composed environments.

Each agent in `env.agent_groups` owns a policy/value network pair: the joint
rollout policy concatenates per-agent action slices; each agent's PPO loss
uses its own reward component (the env emits a per-agent reward vector) and
its own action slice.  Parameters are disjoint so one optimizer over the
dict of agents is exactly per-agent optimization.

Role parity: /root/reference/brax/experimental/composer/training/mappo.py
(592 LoC built on the legacy braxlines PPO); this implementation reuses the
shard_map PPO machinery (brax_tpu/training/agents/ppo).
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from brax_tpu import envs
from brax_tpu.envs import wrappers
from brax_tpu.training import acting, gradients, mesh_utils, running_statistics, types
from brax_tpu.training.agents.ppo import losses as ppo_losses
from brax_tpu.training.agents.ppo import networks as ppo_networks
from brax_tpu.training.types import Params, PRNGKey

Metrics = types.Metrics
AXIS = mesh_utils.AXIS


@flax.struct.dataclass
class TrainingState:
    optimizer_state: optax.OptState
    params: Dict[str, ppo_losses.PPONetworkParams]
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jnp.ndarray


def make_joint_inference_fn(ppo_network, agent_names, agent_slices, action_size):
    """Joint policy: each agent's network acts on its action slice."""

    def make_policy(params, deterministic: bool = False) -> types.Policy:
        normalizer_params, agent_params = params
        dist = ppo_network.parametric_action_distribution

        def policy(observations, key_sample):
            actions = jnp.zeros(observations.shape[:-1] + (action_size,))
            extras = {}
            for i, agent in enumerate(agent_names):
                key_agent = jax.random.fold_in(key_sample, i)
                logits = ppo_network.policy_network.apply(
                    normalizer_params, agent_params[agent].policy, observations
                )
                if deterministic:
                    act = dist.mode(logits)
                    raw = act
                    log_prob = jnp.zeros(observations.shape[:-1])
                else:
                    raw = dist.sample_no_postprocessing(logits, key_agent)
                    log_prob = dist.log_prob(logits, raw)
                    act = dist.postprocess(raw)
                idx = jnp.asarray(agent_slices[agent])
                actions = actions.at[..., idx].set(act)
                extras[f"{agent}_log_prob"] = log_prob
                extras[f"{agent}_raw_action"] = raw
            return actions, extras

        return policy

    return make_policy


def compute_mappo_loss(
    params: Dict[str, ppo_losses.PPONetworkParams],
    normalizer_params,
    data: types.Transition,
    rng: jnp.ndarray,
    ppo_network,
    agent_names,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    reward_scaling: float = 1.0,
    gae_lambda: float = 0.95,
    clipping_epsilon: float = 0.3,
    normalize_advantage: bool = True,
):
    """Sum of per-agent PPO losses (disjoint params => decoupled grads)."""
    dist = ppo_network.parametric_action_distribution
    data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 0, 1), data)

    total = jnp.zeros(())
    metrics = {}
    for i, agent in enumerate(agent_names):
        p = params[agent]
        policy_logits = ppo_network.policy_network.apply(
            normalizer_params, p.policy, data.observation
        )
        baseline = ppo_network.value_network.apply(
            normalizer_params, p.value, data.observation
        )
        bootstrap_value = ppo_network.value_network.apply(
            normalizer_params, p.value, data.next_observation[-1]
        )

        rewards = data.reward[..., i] * reward_scaling
        truncation = data.extras["state_extras"]["truncation"]
        termination = (1 - data.discount) * (1 - truncation)

        raw_action = data.extras["policy_extras"][f"{agent}_raw_action"]
        behaviour_log_probs = data.extras["policy_extras"][f"{agent}_log_prob"]
        target_log_probs = dist.log_prob(policy_logits, raw_action)

        vs, advantages = ppo_losses.compute_gae(
            truncation=truncation,
            termination=termination,
            rewards=rewards,
            values=baseline,
            bootstrap_value=bootstrap_value,
            lambda_=gae_lambda,
            discount=discounting,
        )
        if normalize_advantage:
            advantages = (advantages - advantages.mean()) / (advantages.std() + 1e-8)
        rho_s = jnp.exp(target_log_probs - behaviour_log_probs)
        s1 = rho_s * advantages
        s2 = jnp.clip(rho_s, 1 - clipping_epsilon, 1 + clipping_epsilon) * advantages
        policy_loss = -jnp.mean(jnp.minimum(s1, s2))
        v_error = vs - baseline
        v_loss = jnp.mean(v_error * v_error) * 0.5 * 0.5
        rng, rng_ent = jax.random.split(rng)
        entropy = jnp.mean(dist.entropy(policy_logits, rng_ent))
        entropy_loss = entropy_cost * -entropy
        agent_loss = policy_loss + v_loss + entropy_loss
        total += agent_loss
        metrics[f"{agent}/policy_loss"] = policy_loss
        metrics[f"{agent}/v_loss"] = v_loss
    metrics["total_loss"] = total
    return total, metrics


def train(
    environment: envs.Env,
    num_timesteps: int,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    entropy_cost: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    unroll_length: int = 10,
    batch_size: int = 32,
    num_minibatches: int = 16,
    num_updates_per_batch: int = 2,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    clipping_epsilon: float = 0.3,
    gae_lambda: float = 0.95,
    deterministic_eval: bool = False,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    mesh=None,
    use_fused_kernel: Optional[bool] = None,
):
    """MAPPO training on a multi-agent ComponentEnv.

    Returns (make_joint_policy, (normalizer_params, agent_params), metrics).
    """
    import jax as _jax

    from brax_tpu.sim import kernels as _sim_kernels

    # composed scenes lower to the fused whole-step kernel (all composer
    # scene graphs are supported(); see tools/bench_composer.py)
    if use_fused_kernel is None:
        use_fused_kernel = _jax.default_backend() == "tpu"
    _prev_kernel_enabled = _sim_kernels.enabled()
    _sim_kernels.enable(bool(use_fused_kernel))

    inner = environment.unwrapped if hasattr(environment, "unwrapped") else environment
    assert getattr(inner, "is_multiagent", False), "environment must be multi-agent"
    agent_names = inner.agent_names
    agent_slices = {
        a: inner.group_action_shapes[a]["indices"] for a in agent_names
    }
    n_agents = len(agent_names)

    assert batch_size * num_minibatches % num_envs == 0
    mesh = mesh or mesh_utils.create_mesh()
    device_count = mesh.size
    assert num_envs % device_count == 0

    env_step_per_training_step = (
        batch_size * unroll_length * num_minibatches * action_repeat
    )
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = -(
        -num_timesteps // (num_evals_after_init * env_step_per_training_step)
    )

    env = wrappers.wrap_for_training(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )

    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    obs_size = env.observation_size
    # per-agent action sizes must agree for a shared network shape
    sizes = {len(agent_slices[a]) for a in agent_names}
    assert len(sizes) == 1, "agents must share an action size"
    per_agent_action_size = sizes.pop()
    ppo_network = ppo_networks.make_ppo_networks(
        obs_size, per_agent_action_size, preprocess_observations_fn=normalize
    )
    make_policy = make_joint_inference_fn(
        ppo_network, agent_names, agent_slices, env.action_size
    )

    optimizer = optax.adam(learning_rate=learning_rate)
    loss_fn = functools.partial(
        compute_mappo_loss,
        ppo_network=ppo_network,
        agent_names=agent_names,
        entropy_cost=entropy_cost,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
    )
    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=AXIS, has_aux=True
    )

    def minibatch_step(carry, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params, normalizer_params, data, key_loss, optimizer_state=optimizer_state
        )
        return (optimizer_state, params, key), metrics

    def sgd_step(carry, unused_t, data, normalizer_params):
        optimizer_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert_data(x):
            x = jax.random.permutation(key_perm, x)
            return jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])

        shuffled = jax.tree_util.tree_map(convert_data, data)
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step, normalizer_params=normalizer_params),
            (optimizer_state, params, key_grad),
            shuffled,
            length=num_minibatches,
        )
        return (optimizer_state, params, key), metrics

    def training_step(carry, unused_t):
        training_state, state, key = carry
        key_sgd, key_unroll, new_key = jax.random.split(key, 3)
        policy = make_policy(
            (training_state.normalizer_params, training_state.params)
        )

        def f(carry, unused_t):
            current_state, current_key = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data = acting.generate_unroll(
                env, current_state, policy, current_key, unroll_length,
                extra_fields=("truncation",),
            )
            return (next_state, next_key), data

        (state, _), data = jax.lax.scan(
            f, (state, key_unroll), (), length=batch_size * num_minibatches // num_envs
        )
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree_util.tree_map(lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data)

        normalizer_params = running_statistics.update(
            training_state.normalizer_params, data.observation, pmap_axis_name=AXIS
        )
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(sgd_step, data=data, normalizer_params=normalizer_params),
            (training_state.optimizer_state, training_state.params, key_sgd),
            (),
            length=num_updates_per_batch,
        )
        new_training_state = TrainingState(
            optimizer_state=optimizer_state,
            params=params,
            normalizer_params=normalizer_params,
            env_steps=training_state.env_steps + env_step_per_training_step,
        )
        return (new_training_state, state, new_key), metrics

    def training_epoch(training_state, state, key):
        key = jnp.squeeze(key, axis=0)
        (training_state, state, _), metrics = jax.lax.scan(
            training_step, (training_state, state, key), (),
            length=num_training_steps_per_epoch,
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        metrics = jax.lax.pmean(metrics, axis_name=AXIS)
        return training_state, state, metrics

    training_epoch = jax.jit(
        mesh_utils.shard_map(
            training_epoch, mesh,
            in_specs=(P(), P(AXIS), P(AXIS)),
            out_specs=(P(), P(AXIS), P()),
        ),
        donate_argnums=(0, 1),
    )

    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    local_key, key_env, eval_key = jax.random.split(local_key, 3)

    agent_params = {}
    for i, agent in enumerate(agent_names):
        kp, kv = jax.random.split(jax.random.fold_in(global_key, i))
        agent_params[agent] = ppo_losses.PPONetworkParams(
            policy=ppo_network.policy_network.init(kp),
            value=ppo_network.value_network.init(kv),
        )
    training_state = TrainingState(
        optimizer_state=optimizer.init(agent_params),
        params=agent_params,
        normalizer_params=running_statistics.init_state(
            running_statistics.ArraySpec((obs_size,), jnp.float32)
        ),
        env_steps=jnp.zeros(()),
    )
    training_state = mesh_utils.put_replicated(training_state, mesh)

    key_envs = jax.random.split(key_env, num_envs)
    reset_fn = jax.jit(env.reset, out_shardings=mesh_utils.env_sharded(mesh))
    env_state = reset_fn(mesh_utils.put_env_sharded(key_envs, mesh))

    evaluator = acting.Evaluator(
        env,
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
    )

    metrics = {}
    current_step = 0
    for it in range(num_evals_after_init):
        epoch_key, local_key = jax.random.split(local_key)
        epoch_keys = mesh_utils.put_env_sharded(
            jax.random.split(epoch_key, device_count), mesh
        )
        training_state, env_state, training_metrics = training_epoch(
            training_state, env_state, epoch_keys
        )
        current_step = int(training_state.env_steps)
        if jax.process_index() == 0:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.params),
                {f"training/{k}": v for k, v in training_metrics.items()},
            )
            progress_fn(current_step, metrics)

    params = (training_state.normalizer_params, training_state.params)
    mesh_utils.synchronize_hosts()
    _sim_kernels.enable(_prev_kernel_enabled)
    return (make_policy, params, metrics)
