"""Augmented random search (ARS v2-t, arXiv:1803.07055), TPU-native.

The 2·directions antithetic population shards over the device mesh inside one
shard_mapped episode evaluation (replacing the reference's pmap,
/root/reference/brax/training/agents/ars/train.py:116-216).  Top-k direction
filtering and the reward-std-scaled update run replicated.
"""

from __future__ import annotations

import time
from typing import Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from brax_tpu import envs
from brax_tpu.envs import wrappers
from brax_tpu.training import acting, mesh_utils, running_statistics, types
from brax_tpu.training.agents.ars import networks as ars_networks
from brax_tpu.training.types import Params, PRNGKey

Metrics = types.Metrics
AXIS = mesh_utils.AXIS


@flax.struct.dataclass
class TrainingState:
    """Learner state."""

    normalizer_params: running_statistics.RunningStatisticsState
    policy_params: Params
    num_env_steps: jnp.ndarray


def train(
    environment: envs.Env,
    num_timesteps: int = 100,
    episode_length: int = 1000,
    action_repeat: int = 1,
    number_of_directions: int = 60,
    top_directions: int = 20,
    step_size: float = 0.015,
    num_eval_envs: int = 128,
    exploration_noise_std: float = 0.025,
    seed: int = 0,
    normalize_observations: bool = False,
    num_evals: int = 1,
    reward_shift: float = 0.0,
    network_factory: types.NetworkFactory = ars_networks.make_policy_network,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    eval_env: Optional[envs.Env] = None,
    mesh=None,
    use_fused_kernel=None,
    aot_cache: bool = False,
):
    """ARS training; returns (make_policy, params, metrics)."""
    # fused Pallas physics for rollouts (see ppo.train): auto-on for TPU
    import jax as _jax

    from brax_tpu.sim import kernels as _sim_kernels
    from brax_tpu.v2.generalized import kernels as _g_kernels

    if use_fused_kernel is None:
        use_fused_kernel = _jax.default_backend() == "tpu"
    _prev_kernel_enabled = _sim_kernels.enabled()
    _prev_g_kernel_enabled = _g_kernels.enabled()
    _sim_kernels.enable(bool(use_fused_kernel))
    _g_kernels.enable(bool(use_fused_kernel))

    top_directions = min(top_directions, number_of_directions)
    num_envs = number_of_directions * 2  # noise + anti-noise
    if jax.process_count() > 1:
        raise ValueError("ARS does not support multiple hosts")

    mesh = mesh or mesh_utils.create_mesh()
    device_count = mesh.size
    assert num_envs % device_count == 0

    # aot_cache=True: epoch + eval unroll round-trip the on-disk StableHLO
    # cache (brax_tpu.aot) — warm restarts skip tracing (see ppo.train)
    aot_fp = None
    if aot_cache:
        from brax_tpu import aot

        aot_fp = aot.fingerprint(
            "ars",
            num_timesteps, episode_length, action_repeat,
            number_of_directions, top_directions, step_size, num_eval_envs,
            exploration_noise_std, normalize_observations, num_evals,
            reward_shift, use_fused_kernel,
            aot.fingerprint_callable(network_factory),
            type(environment).__module__ + "." + type(environment).__qualname__,
            aot.fingerprint_pytree(getattr(environment, "sys", None)),
        )

    num_env_steps_between_evals = num_timesteps // num_evals
    next_eval_step = num_timesteps - (num_evals - 1) * num_env_steps_between_evals

    env = wrappers.wrap_for_training_any(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )
    obs_size = env.observation_size

    normalize_fn = lambda x, y: x
    if normalize_observations:
        normalize_fn = running_statistics.normalize
    ars_network = network_factory(
        observation_size=obs_size,
        action_size=env.action_size,
        preprocess_observations_fn=normalize_fn,
    )
    make_policy = ars_networks.make_inference_fn(ars_network)

    vmapped_policy = jax.vmap(ars_network.apply, in_axes=(None, 0, 0))

    def run_step(carry, unused_t):
        (env_state, policy_params, cumulative_reward, active_episode,
         normalizer_params) = carry
        actions = vmapped_policy(normalizer_params, policy_params, env_state.obs)
        nstate = env.step(env_state, actions)
        cumulative_reward = cumulative_reward + (nstate.reward - reward_shift) * active_episode
        new_active_episode = active_episode * (1 - nstate.done)
        return (
            nstate, policy_params, cumulative_reward, new_active_episode,
            normalizer_params,
        ), (env_state.obs, active_episode)

    def run_episode(normalizer_params, params, key):
        """Evaluates a shard of the population for one episode (in shard_map)."""
        key = jnp.squeeze(key, axis=0)
        reset_keys = jax.random.split(key, num_envs // device_count)
        first_env_states = env.reset(reset_keys)
        cumulative_reward = first_env_states.reward
        active_episode = jnp.ones_like(cumulative_reward)
        (_, _, cumulative_reward, _, _), (obs, obs_weights) = jax.lax.scan(
            run_step,
            (first_env_states, params, cumulative_reward, active_episode,
             normalizer_params),
            (),
            length=episode_length // action_repeat,
        )
        return cumulative_reward, obs, obs_weights

    prun_episode = jax.jit(
        mesh_utils.shard_map(
            run_episode,
            mesh,
            in_specs=(P(), P(AXIS), P(AXIS)),
            out_specs=(P(AXIS), P(None, AXIS), P(None, AXIS)),
        )
    )

    def add_noise(params: Params, key: PRNGKey) -> Tuple[Params, Params, Params]:
        num_vars = len(jax.tree_util.tree_leaves(params))
        treedef = jax.tree_util.tree_structure(params)
        all_keys = jax.random.split(key, num=num_vars)
        noise = jax.tree_util.tree_map(
            lambda g, k: jax.random.normal(k, shape=g.shape, dtype=g.dtype),
            params,
            jax.tree_util.tree_unflatten(treedef, all_keys),
        )
        params_with_noise = jax.tree_util.tree_map(
            lambda g, n: g + n * exploration_noise_std, params, noise
        )
        params_with_anti_noise = jax.tree_util.tree_map(
            lambda g, n: g - n * exploration_noise_std, params, noise
        )
        return params_with_noise, params_with_anti_noise, noise

    def _training_epoch(training_state: TrainingState, key: PRNGKey):
        params = jax.tree_util.tree_map(
            lambda x: jnp.repeat(
                jnp.expand_dims(x, axis=0), number_of_directions, axis=0
            ),
            training_state.policy_params,
        )
        key, key_noise, key_es_eval = jax.random.split(key, 3)
        params_with_noise, params_with_anti_noise, noise = add_noise(params, key_noise)

        pparams = jax.tree_util.tree_map(
            lambda a, b: jnp.concatenate([a, b], axis=0),
            params_with_noise,
            params_with_anti_noise,
        )
        key_es_eval = jax.random.split(key_es_eval, device_count)
        eval_scores, obs, obs_weights = prun_episode(
            training_state.normalizer_params, pparams, key_es_eval
        )

        obs = jnp.reshape(obs, (-1,) + obs.shape[2:])
        obs_weights = jnp.reshape(obs_weights, (-1,) + obs_weights.shape[2:])
        normalizer_params = running_statistics.update(
            training_state.normalizer_params, obs, weights=obs_weights
        )

        eval_scores = jnp.reshape(eval_scores, [-1])
        reward_plus, reward_minus = jnp.split(eval_scores, 2, axis=0)
        reward_max = jnp.maximum(reward_plus, reward_minus)
        reward_rank = jnp.argsort(jnp.argsort(-reward_max))
        reward_weight = jnp.where(reward_rank < top_directions, 1, 0)
        reward_weight_double = jnp.concatenate([reward_weight, reward_weight], axis=0)
        reward_std = jnp.std(eval_scores, where=reward_weight_double.astype(bool))
        # degenerate case: all selected rewards equal (constant-reward envs)
        # yields std 0 (or nan when nothing is selected) — dividing by it
        # would poison the params with inf/nan, so fall back to unit scale
        reward_std = jnp.where(
            jnp.isfinite(reward_std) & (reward_std > 0), reward_std, 1.0
        )

        noise = jax.tree_util.tree_map(
            lambda x: jnp.sum(
                jnp.transpose(
                    jnp.transpose(x) * reward_weight * (reward_plus - reward_minus)
                ),
                axis=0,
            ),
            noise,
        )
        policy_params = jax.tree_util.tree_map(
            lambda x, y: x + step_size * y / (top_directions * reward_std),
            training_state.policy_params,
            noise,
        )
        num_env_steps = (
            training_state.num_env_steps
            + jnp.sum(obs_weights, dtype=jnp.int32) * action_repeat
        )

        metrics = {
            "params_norm": optax.global_norm(policy_params),
            "eval_scores_mean": jnp.mean(eval_scores),
            "eval_scores_std": jnp.std(eval_scores),
            "weights": jnp.mean(reward_weight),
        }
        return (
            TrainingState(
                normalizer_params=normalizer_params,
                policy_params=policy_params,
                num_env_steps=num_env_steps,
            ),
            metrics,
        )

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, key):
        nonlocal training_walltime
        t = time.time()
        training_state, metrics = training_epoch(training_state, key)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (num_envs * episode_length) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": value for name, value in metrics.items()},
        }
        return training_state, metrics

    key = jax.random.PRNGKey(seed)
    key, network_key, eval_key = jax.random.split(key, 3)

    # one jitted program for the initial TrainingState (see ppo.train)
    def _init_training_state(network_key):
        return TrainingState(
            normalizer_params=running_statistics.init_state(
                running_statistics.ArraySpec((obs_size,), jnp.float32)
            ),
            policy_params=ars_network.init(network_key),
            num_env_steps=jnp.zeros((), jnp.int32),
        )

    training_state = jax.jit(_init_training_state)(network_key)

    if aot_cache:
        from brax_tpu import aot

        training_epoch, _ = aot.cached_call(
            _training_epoch,
            f"ars_epoch_{aot_fp}",
            (training_state, jax.random.PRNGKey(0)),
        )
    else:
        training_epoch = jax.jit(_training_epoch)

    if not eval_env:
        eval_env = env
    else:
        eval_env = wrappers.wrap_for_training_any(
            eval_env, episode_length=episode_length, action_repeat=action_repeat
        )
    evaluator = acting.Evaluator(
        eval_env,
        make_policy,
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
        aot_key=f"ars_{aot_fp}" if aot_cache else None,
    )

    metrics = {}
    while int(training_state.num_env_steps) < num_timesteps:
        key, epoch_key = jax.random.split(key)
        training_state, training_metrics = training_epoch_with_timing(
            training_state, epoch_key
        )
        if int(training_state.num_env_steps) >= next_eval_step:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.policy_params),
                training_metrics,
            )
            progress_fn(int(training_state.num_env_steps), metrics)
            next_eval_step += num_env_steps_between_evals

    total_steps = int(training_state.num_env_steps)
    assert total_steps >= num_timesteps

    params = (training_state.normalizer_params, training_state.policy_params)
    _sim_kernels.enable(_prev_kernel_enabled)
    _g_kernels.enable(_prev_g_kernel_enabled)
    return (make_policy, params, metrics)
