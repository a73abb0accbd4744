"""Analytic policy gradients through the differentiable physics step.

`jax.grad` flows through the scanned rollout — including the PBD contact
solver — with optional `truncation_length` stop-gradients bounding BPTT
depth.  Env shards + grad pmean run inside one shard_mapped epoch (replacing
the reference's pmap, /root/reference/brax/training/agents/apg/train.py:
61-220); algorithmic content is identical.
"""

from __future__ import annotations

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
from brax_tpu.training.agents.apg import networks as apg_networks
from brax_tpu.training.types import Params, PRNGKey

Metrics = types.Metrics
AXIS = mesh_utils.AXIS


@flax.struct.dataclass
class TrainingState:
    """Learner state."""

    optimizer_state: optax.OptState
    normalizer_params: running_statistics.RunningStatisticsState
    policy_params: Params


def train(
    environment: envs.Env,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    seed: int = 0,
    truncation_length: Optional[int] = None,
    max_gradient_norm: float = 1e9,
    num_evals: int = 1,
    normalize_observations: bool = False,
    deterministic_eval: bool = False,
    network_factory: types.NetworkFactory = apg_networks.make_apg_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    eval_env: Optional[envs.Env] = None,
    mesh=None,
    use_fused_kernel: Optional[bool] = None,
    aot_cache: bool = False,
):
    """Direct trajectory optimization; returns (make_policy, params, metrics)."""
    import jax as _jax

    from brax_tpu.sim import kernels as _sim_kernels
    from brax_tpu.v2.generalized import kernels as _g_kernels

    # Both fused kernels carry custom VJPs (Pallas forward, XLA backward),
    # so APG's grads flow through them.
    if use_fused_kernel is None:
        use_fused_kernel = _jax.default_backend() == "tpu"
    _prev_kernel_enabled = _sim_kernels.enabled()
    _prev_g_kernel_enabled = _g_kernels.enabled()
    _sim_kernels.enable(bool(use_fused_kernel))
    _g_kernels.enable(bool(use_fused_kernel))

    mesh = mesh or mesh_utils.create_mesh()
    device_count = mesh.size
    assert num_envs % device_count == 0
    if truncation_length is not None:
        assert truncation_length > 0

    # aot_cache=True: epoch (forward + BPTT backward through the episode)
    # + eval unroll round-trip the on-disk StableHLO cache (see ppo.train)
    aot_fp = None
    if aot_cache:
        from brax_tpu import aot

        aot_fp = aot.fingerprint(
            "apg",
            episode_length, action_repeat, num_envs, num_eval_envs,
            learning_rate, truncation_length, max_gradient_norm, num_evals,
            normalize_observations, deterministic_eval, use_fused_kernel,
            aot.fingerprint_callable(network_factory),
            type(environment).__module__ + "." + type(environment).__qualname__,
            aot.fingerprint_pytree(getattr(environment, "sys", None)),
        )

    num_evals_after_init = max(num_evals - 1, 1)

    env = wrappers.wrap_for_training_any(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )

    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    apg_network = network_factory(
        env.observation_size, env.action_size, preprocess_observations_fn=normalize
    )
    make_policy = apg_networks.make_inference_fn(apg_network)

    optimizer = optax.adam(learning_rate=learning_rate)

    def env_step(carry: Tuple[envs.State, PRNGKey], step_index: int, policy):
        env_state, key = carry
        key, key_sample = jax.random.split(key)
        actions = policy(env_state.obs, key_sample)[0]
        nstate = env.step(env_state, actions)
        if truncation_length is not None:
            nstate = jax.lax.cond(
                jnp.mod(step_index + 1, truncation_length) == 0.0,
                jax.lax.stop_gradient,
                lambda x: x,
                nstate,
            )
        return (nstate, key), (nstate.reward, env_state.obs)

    def loss(policy_params, normalizer_params, key):
        key_reset, key_scan = jax.random.split(key)
        env_state = env.reset(jax.random.split(key_reset, num_envs // device_count))
        f = functools.partial(
            env_step, policy=make_policy((normalizer_params, policy_params))
        )
        (rewards, obs) = jax.lax.scan(
            f,
            (env_state, key_scan),
            jnp.arange(episode_length // action_repeat),
        )[1]
        return -jnp.mean(rewards), obs

    loss_grad = jax.grad(loss, has_aux=True)

    def clip_by_global_norm(updates):
        g_norm = optax.global_norm(updates)
        trigger = g_norm < max_gradient_norm
        return jax.tree_util.tree_map(
            lambda t: jnp.where(trigger, t, (t / g_norm) * max_gradient_norm),
            updates,
        )

    def training_epoch(training_state: TrainingState, key: PRNGKey):
        key = jnp.squeeze(key, axis=0)
        key, key_grad = jax.random.split(key)
        grad, obs = loss_grad(
            training_state.policy_params, training_state.normalizer_params, key_grad
        )
        grad = clip_by_global_norm(grad)
        grad = jax.lax.pmean(grad, axis_name=AXIS)
        params_update, optimizer_state = optimizer.update(
            grad, training_state.optimizer_state
        )
        policy_params = optax.apply_updates(
            training_state.policy_params, params_update
        )
        normalizer_params = running_statistics.update(
            training_state.normalizer_params, obs, pmap_axis_name=AXIS
        )
        metrics = {
            "grad_norm": optax.global_norm(grad),
            "params_norm": optax.global_norm(policy_params),
        }
        metrics = jax.lax.pmean(metrics, axis_name=AXIS)
        return (
            TrainingState(
                optimizer_state=optimizer_state,
                normalizer_params=normalizer_params,
                policy_params=policy_params,
            ),
            metrics,
        )

    training_epoch_sm = mesh_utils.shard_map(
        training_epoch,
        mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=(P(), P()),
    )
    training_epoch = jax.jit(training_epoch_sm)

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, key):
        nonlocal training_walltime
        t = time.time()
        training_state, metrics = training_epoch(training_state, key)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)
        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (episode_length * num_envs) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": value for name, value in metrics.items()},
        }
        return training_state, metrics

    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key = jax.random.fold_in(local_key, jax.process_index())
    local_key, eval_key = jax.random.split(local_key)

    # one jitted program for the initial TrainingState (see ppo.train)
    def _init_training_state(global_key):
        policy_params = apg_network.policy_network.init(global_key)
        return TrainingState(
            optimizer_state=optimizer.init(policy_params),
            policy_params=policy_params,
            normalizer_params=running_statistics.init_state(
                running_statistics.ArraySpec((env.observation_size,), jnp.float32)
            ),
        )

    training_state = jax.jit(_init_training_state)(global_key)
    del global_key
    training_state = mesh_utils.put_replicated(training_state, mesh)

    if aot_cache:
        from brax_tpu import aot

        _example_keys = mesh_utils.put_env_sharded(
            jax.random.split(jax.random.PRNGKey(0), device_count), mesh
        )
        training_epoch, _ = aot.cached_call(
            training_epoch_sm,
            f"apg_epoch_{aot_fp}",
            (training_state, _example_keys),
        )

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
        aot_key=f"apg_{aot_fp}" if aot_cache else None,
    )

    metrics = {}
    if jax.process_index() == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.policy_params),
            training_metrics={},
        )
        progress_fn(0, metrics)

    for it in range(num_evals_after_init):
        epoch_key, local_key = jax.random.split(local_key)
        epoch_keys = mesh_utils.put_env_sharded(
            jax.random.split(epoch_key, device_count), mesh
        )
        training_state, training_metrics = training_epoch_with_timing(
            training_state, epoch_keys
        )

        if jax.process_index() == 0:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.policy_params),
                training_metrics,
            )
            progress_fn(it + 1, metrics)

    params = (training_state.normalizer_params, training_state.policy_params)
    mesh_utils.synchronize_hosts()
    _sim_kernels.enable(_prev_kernel_enabled)
    _g_kernels.enable(_prev_g_kernel_enabled)
    return (make_policy, params, metrics)
