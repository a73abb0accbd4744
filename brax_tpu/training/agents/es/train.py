"""Evolution strategies (OpenAI-ES, arXiv:1703.03864), TPU-native.

Population parallelism: the 2·population antithetic member axis shards over
the device mesh inside one shard_mapped episode-evaluation program (replacing
the reference's pmap over a leading device axis,
/root/reference/brax/training/agents/es/train.py:99-260); fitness shaping and
the noise-weighted update run replicated on host-visible arrays.
"""

from __future__ import annotations

import enum
import functools
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
from brax_tpu.training.agents.es import networks as es_networks
from brax_tpu.training.types import Params, PRNGKey

Metrics = types.Metrics
AXIS = mesh_utils.AXIS


@flax.struct.dataclass
class TrainingState:
    """Learner state."""

    normalizer_params: running_statistics.RunningStatisticsState
    optimizer_state: optax.OptState
    policy_params: Params
    num_env_steps: jnp.ndarray


def centered_rank(x: jnp.ndarray) -> jnp.ndarray:
    x = jnp.argsort(jnp.argsort(x))
    x /= len(x) - 1
    return x - 0.5


def wierstra(x: jnp.ndarray) -> jnp.ndarray:
    x = len(x) - jnp.argsort(jnp.argsort(x))
    x = jnp.maximum(0, jnp.log(len(x) / 2.0 + 1) - jnp.log(x))
    return x / jnp.sum(x) - 1.0 / len(x)


class FitnessShaping(enum.Enum):
    ORIGINAL = functools.partial(lambda x: x)
    CENTERED_RANK = functools.partial(centered_rank)
    WIERSTRA = functools.partial(wierstra)


def train(
    environment: envs.Env,
    num_timesteps: int = 100,
    episode_length: int = 1000,
    action_repeat: int = 1,
    l2coeff: float = 0,
    population_size: int = 128,
    learning_rate: float = 1e-3,
    fitness_shaping: FitnessShaping = FitnessShaping.ORIGINAL,
    num_eval_envs: int = 128,
    perturbation_std: float = 0.1,
    seed: int = 0,
    normalize_observations: bool = False,
    num_evals: int = 1,
    center_fitness: bool = False,
    deterministic_eval: bool = False,
    network_factory: types.NetworkFactory = es_networks.make_es_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    eval_env: Optional[envs.Env] = None,
    mesh=None,
    use_fused_kernel=None,
    aot_cache: bool = False,
):
    """ES training; returns (make_policy, params, metrics)."""
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

    num_envs = population_size * 2  # noise + anti-noise
    if jax.process_count() > 1:
        raise ValueError("ES does not support multiple hosts")

    mesh = mesh or mesh_utils.create_mesh()
    device_count = mesh.size
    assert num_envs % device_count == 0

    # aot_cache=True: epoch + eval unroll round-trip the on-disk StableHLO
    # cache (brax_tpu.aot) — warm restarts skip tracing (see ppo.train)
    aot_fp = None
    if aot_cache:
        from brax_tpu import aot

        aot_fp = aot.fingerprint(
            "es",
            num_timesteps, episode_length, action_repeat, l2coeff,
            population_size, learning_rate, fitness_shaping.name,
            num_eval_envs, perturbation_std, normalize_observations,
            num_evals, center_fitness, deterministic_eval, use_fused_kernel,
            aot.fingerprint_callable(network_factory),
            type(environment).__module__ + "." + type(environment).__qualname__,
            aot.fingerprint_pytree(getattr(environment, "sys", None)),
        )

    num_evals_after_init = max(num_evals - 1, 1)
    num_env_steps_between_evals = num_timesteps // num_evals_after_init
    next_eval_step = num_timesteps - (num_evals_after_init - 1) * num_env_steps_between_evals

    env = wrappers.wrap_for_training_any(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )
    obs_size = env.observation_size

    normalize_fn = lambda x, y: x
    if normalize_observations:
        normalize_fn = running_statistics.normalize
    es_network = network_factory(
        observation_size=obs_size,
        action_size=env.action_size,
        preprocess_observations_fn=normalize_fn,
    )
    make_policy = es_networks.make_inference_fn(es_network)

    optimizer = optax.adam(learning_rate=learning_rate)

    vmapped_policy = jax.vmap(es_network.policy_network.apply, in_axes=(None, 0, 0))

    def run_step(carry, unused_t):
        (env_state, policy_params, key, cumulative_reward, active_episode,
         normalizer_params) = carry
        key, key_sample = jax.random.split(key)
        logits = vmapped_policy(normalizer_params, policy_params, env_state.obs)
        actions = es_network.parametric_action_distribution.sample(logits, key_sample)
        nstate = env.step(env_state, actions)
        cumulative_reward = cumulative_reward + nstate.reward * active_episode
        new_active_episode = active_episode * (1 - nstate.done)
        return (
            nstate, policy_params, key, cumulative_reward, new_active_episode,
            normalizer_params,
        ), (env_state.obs, active_episode)

    def run_episode(normalizer_params, params, key):
        """Evaluates a shard of the population for one episode.

        Runs inside shard_map: `params` arrive with a leading
        (num_envs // device_count) member axis; `key` with a leading
        length-1 device axis.
        """
        key = jnp.squeeze(key, axis=0)
        key_scan, key_reset = jax.random.split(key)
        reset_keys = jax.random.split(key_reset, num_envs // device_count)
        first_env_states = env.reset(reset_keys)
        cumulative_reward = first_env_states.reward
        active_episode = jnp.ones_like(cumulative_reward)
        (_, _, key, cumulative_reward, _, _), (obs, obs_weights) = jax.lax.scan(
            run_step,
            (first_env_states, params, key_scan, cumulative_reward, active_episode,
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
            lambda g, n: g + n * perturbation_std, params, noise
        )
        params_with_anti_noise = jax.tree_util.tree_map(
            lambda g, n: g - n * perturbation_std, params, noise
        )
        return params_with_noise, params_with_anti_noise, noise

    def compute_delta(params, noise, weights):
        """Noise-weighted ES update direction for one param leaf."""
        weights = jnp.reshape(weights, [population_size] + [1] * (noise.ndim - 1))
        delta = jnp.sum(noise * weights, axis=0) / population_size
        delta = delta - l2coeff * params
        return -delta

    def _training_epoch(training_state: TrainingState, key: PRNGKey):
        params = jax.tree_util.tree_map(
            lambda x: jnp.repeat(jnp.expand_dims(x, axis=0), population_size, axis=0),
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

        weights = jnp.reshape(eval_scores, [-1])
        weights = fitness_shaping.value(weights)
        if center_fitness:
            weights = (weights - jnp.mean(weights)) / (1e-6 + jnp.std(weights))
        weights1, weights2 = jnp.split(weights, 2)
        weights = weights1 - weights2

        delta = jax.tree_util.tree_map(
            functools.partial(compute_delta, weights=weights),
            training_state.policy_params,
            noise,
        )
        params_update, optimizer_state = optimizer.update(
            delta, training_state.optimizer_state
        )
        policy_params = optax.apply_updates(
            training_state.policy_params, params_update
        )
        num_env_steps = (
            training_state.num_env_steps
            + jnp.sum(obs_weights, dtype=jnp.int32) * action_repeat
        )

        metrics = {
            "params_norm": optax.global_norm(policy_params),
            "eval_scores_mean": jnp.mean(eval_scores),
            "eval_scores_std": jnp.std(eval_scores),
            "weights": jnp.mean(weights),
        }
        return (
            TrainingState(
                normalizer_params=normalizer_params,
                optimizer_state=optimizer_state,
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

    # one jitted program for the initial TrainingState (see ppo.train:
    # eager init is hundreds of per-op RPCs over a tunneled TPU)
    def _init_training_state(network_key):
        policy_params = es_network.policy_network.init(network_key)
        return TrainingState(
            normalizer_params=running_statistics.init_state(
                running_statistics.ArraySpec((obs_size,), jnp.float32)
            ),
            optimizer_state=optimizer.init(policy_params),
            policy_params=policy_params,
            num_env_steps=jnp.zeros((), jnp.int32),
        )

    training_state = jax.jit(_init_training_state)(network_key)

    if aot_cache:
        from brax_tpu import aot

        training_epoch, _ = aot.cached_call(
            _training_epoch,
            f"es_epoch_{aot_fp}",
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
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
        aot_key=f"es_{aot_fp}" if aot_cache else None,
    )

    metrics = {}
    if num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.policy_params),
            training_metrics={},
        )
        progress_fn(0, metrics)

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
