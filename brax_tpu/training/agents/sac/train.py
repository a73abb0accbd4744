"""Soft actor-critic, TPU-native.

Off-policy actor-learner co-located on device: env shards, a per-shard
replay-buffer slice, and SGD all run inside one shard_mapped program per
epoch; gradients/statistics pmean/psum over the mesh axis.  Replaces the
reference's pmap architecture (/root/reference/brax/training/agents/sac/
train.py:106-381) with GSPMD idioms; algorithmic content is identical:
prefill with a random policy, then per step {collect 1 transition per env,
insert, sample, N sgd steps of alpha/critic/actor + polyak target}.
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
from brax_tpu.training import (
    acting,
    gradients,
    mesh_utils,
    replay_buffers,
    running_statistics,
    types,
)
from brax_tpu.training.agents.sac import losses as sac_losses
from brax_tpu.training.agents.sac import networks as sac_networks
from brax_tpu.training.types import Params, PRNGKey

Metrics = types.Metrics
Transition = types.Transition
ReplayBufferState = replay_buffers.ReplayBufferState
AXIS = mesh_utils.AXIS


@flax.struct.dataclass
class TrainingState:
    """Learner state (replicated across the mesh)."""

    policy_optimizer_state: optax.OptState
    policy_params: Params
    q_optimizer_state: optax.OptState
    q_params: Params
    target_q_params: Params
    gradient_steps: jnp.ndarray
    env_steps: jnp.ndarray
    alpha_optimizer_state: optax.OptState
    alpha_params: Params
    normalizer_params: running_statistics.RunningStatisticsState


def train(
    environment: envs.Env,
    num_timesteps: int,
    episode_length: int,
    action_repeat: int = 1,
    num_envs: int = 1,
    num_eval_envs: int = 128,
    learning_rate: float = 1e-4,
    discounting: float = 0.9,
    seed: int = 0,
    batch_size: int = 256,
    num_evals: int = 1,
    normalize_observations: bool = False,
    reward_scaling: float = 1.0,
    tau: float = 0.005,
    min_replay_size: int = 0,
    max_replay_size: Optional[int] = None,
    grad_updates_per_step: int = 1,
    deterministic_eval: bool = False,
    network_factory: types.NetworkFactory = sac_networks.make_sac_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    checkpoint_logdir: Optional[str] = None,
    checkpoint_dir: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
    eval_env: Optional[envs.Env] = None,
    mesh=None,
    use_fused_kernel=None,
    aot_cache: bool = False,
):
    """SAC training; returns (make_policy, params, metrics)."""
    # fused Pallas physics for rollouts (see ppo.train): auto-on for TPU
    import jax as _jax

    from brax_tpu.sim import kernels as _sim_kernels
    from brax_tpu.v2.generalized import kernels as _g_kernels

    if use_fused_kernel is None:
        use_fused_kernel = _jax.default_backend() == "tpu"
    from brax_tpu.training import fused_mlp as _fused_mlp

    _prev_kernel_enabled = _sim_kernels.enabled()
    _prev_g_kernel_enabled = _g_kernels.enabled()
    _prev_mlp_enabled = _fused_mlp.enabled()
    _sim_kernels.enable(bool(use_fused_kernel))
    _g_kernels.enable(bool(use_fused_kernel))

    mesh = mesh or mesh_utils.create_mesh()
    device_count = mesh.size
    assert num_envs % device_count == 0

    # aot_cache=True: the four jitted programs (reset, prefill, training
    # epoch, eval unroll) round-trip the on-disk StableHLO cache
    # (brax_tpu.aot) so warm restarts skip minutes of fused-kernel tracing;
    # the cached programs drop buffer donation (see ppo.train aot notes).
    aot_fp = None
    if aot_cache:
        from brax_tpu import aot

        aot_fp = aot.fingerprint(
            "sac",
            num_timesteps, episode_length, action_repeat, num_envs,
            num_eval_envs, learning_rate, discounting, batch_size,
            num_evals, normalize_observations, reward_scaling, tau,
            min_replay_size, max_replay_size, grad_updates_per_step,
            deterministic_eval, use_fused_kernel,
            aot.fingerprint_callable(network_factory),
            type(environment).__module__ + "." + type(environment).__qualname__,
            aot.fingerprint_pytree(getattr(environment, "sys", None)),
        )

    if min_replay_size >= num_timesteps:
        raise ValueError("no training would happen: min_replay_size >= num_timesteps")
    if max_replay_size is None:
        max_replay_size = num_timesteps

    env_steps_per_actor_step = action_repeat * num_envs
    num_prefill_actor_steps = -(-min_replay_size // num_envs)
    num_prefill_env_steps = num_prefill_actor_steps * env_steps_per_actor_step
    assert num_timesteps - num_prefill_env_steps >= 0
    num_evals_after_init = max(num_evals - 1, 1)
    num_training_steps_per_epoch = -(
        -(num_timesteps - num_prefill_env_steps)
        // (num_evals_after_init * env_steps_per_actor_step)
    )

    env = wrappers.wrap_for_training_any(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )
    obs_size = env.observation_size
    action_size = env.action_size

    normalize_fn = lambda x, y: x
    if normalize_observations:
        normalize_fn = running_statistics.normalize
    sac_network = network_factory(
        observation_size=obs_size,
        action_size=action_size,
        preprocess_observations_fn=normalize_fn,
    )
    make_policy = sac_networks.make_inference_fn(sac_network)

    alpha_optimizer = optax.adam(learning_rate=3e-4)
    policy_optimizer = optax.adam(learning_rate=learning_rate)
    q_optimizer = optax.adam(learning_rate=learning_rate)

    dummy_obs = jnp.zeros((obs_size,))
    dummy_action = jnp.zeros((action_size,))
    dummy_transition = Transition(
        observation=dummy_obs,
        action=dummy_action,
        reward=jnp.zeros(()),
        discount=jnp.zeros(()),
        next_observation=dummy_obs,
        extras={"state_extras": {"truncation": jnp.zeros(())}, "policy_extras": {}},
    )
    replay_buffer = replay_buffers.UniformSamplingQueue(
        max_replay_size=max_replay_size // device_count,
        dummy_data_sample=dummy_transition,
        sample_batch_size=batch_size * grad_updates_per_step // device_count,
    )

    alpha_loss, critic_loss, actor_loss = sac_losses.make_losses(
        sac_network=sac_network,
        reward_scaling=reward_scaling,
        discounting=discounting,
        action_size=action_size,
    )
    alpha_update = gradients.gradient_update_fn(
        alpha_loss, alpha_optimizer, pmap_axis_name=AXIS
    )
    critic_update = gradients.gradient_update_fn(
        critic_loss, q_optimizer, pmap_axis_name=AXIS
    )
    actor_update = gradients.gradient_update_fn(
        actor_loss, policy_optimizer, pmap_axis_name=AXIS
    )

    def sgd_step(carry, transitions: Transition):
        training_state, key = carry
        key, key_alpha, key_critic, key_actor = jax.random.split(key, 4)

        alpha_loss_v, alpha_params, alpha_optimizer_state = alpha_update(
            training_state.alpha_params,
            training_state.policy_params,
            training_state.normalizer_params,
            transitions,
            key_alpha,
            optimizer_state=training_state.alpha_optimizer_state,
        )
        alpha = jnp.exp(training_state.alpha_params)
        critic_loss_v, q_params, q_optimizer_state = critic_update(
            training_state.q_params,
            training_state.policy_params,
            training_state.normalizer_params,
            training_state.target_q_params,
            alpha,
            transitions,
            key_critic,
            optimizer_state=training_state.q_optimizer_state,
        )
        actor_loss_v, policy_params, policy_optimizer_state = actor_update(
            training_state.policy_params,
            training_state.normalizer_params,
            training_state.q_params,
            alpha,
            transitions,
            key_actor,
            optimizer_state=training_state.policy_optimizer_state,
        )
        new_target_q_params = jax.tree_util.tree_map(
            lambda x, y: x * (1 - tau) + y * tau,
            training_state.target_q_params,
            q_params,
        )

        metrics = {
            "critic_loss": critic_loss_v,
            "actor_loss": actor_loss_v,
            "alpha_loss": alpha_loss_v,
            "alpha": jnp.exp(alpha_params),
        }
        new_training_state = TrainingState(
            policy_optimizer_state=policy_optimizer_state,
            policy_params=policy_params,
            q_optimizer_state=q_optimizer_state,
            q_params=q_params,
            target_q_params=new_target_q_params,
            gradient_steps=training_state.gradient_steps + 1,
            env_steps=training_state.env_steps,
            alpha_optimizer_state=alpha_optimizer_state,
            alpha_params=alpha_params,
            normalizer_params=training_state.normalizer_params,
        )
        return (new_training_state, key), metrics

    def get_experience(normalizer_params, policy_params, env_state, buffer_state, key):
        policy = make_policy((normalizer_params, policy_params))
        env_state, transitions = acting.actor_step(
            env, env_state, policy, key, extra_fields=("truncation",)
        )
        normalizer_params = running_statistics.update(
            normalizer_params, transitions.observation, pmap_axis_name=AXIS
        )
        buffer_state = replay_buffer.insert(buffer_state, transitions)
        return normalizer_params, env_state, buffer_state

    def training_step(training_state, env_state, buffer_state, key):
        experience_key, training_key = jax.random.split(key)
        normalizer_params, env_state, buffer_state = get_experience(
            training_state.normalizer_params,
            training_state.policy_params,
            env_state,
            buffer_state,
            experience_key,
        )
        training_state = training_state.replace(
            normalizer_params=normalizer_params,
            env_steps=training_state.env_steps + env_steps_per_actor_step,
        )

        buffer_state, transitions = replay_buffer.sample(buffer_state)
        transitions = jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (grad_updates_per_step, -1) + x.shape[1:]),
            transitions,
        )
        (training_state, _), metrics = jax.lax.scan(
            sgd_step, (training_state, training_key), transitions
        )
        metrics["buffer_current_size"] = buffer_state.current_size
        metrics["buffer_current_position"] = buffer_state.current_position
        return training_state, env_state, buffer_state, metrics

    def prefill_replay_buffer(training_state, env_state, buffer_state, key):
        key = jnp.squeeze(key, axis=0)
        buffer_state = replay_buffers.shard_view(buffer_state)

        def f(carry, unused):
            training_state, env_state, buffer_state, key = carry
            key, new_key = jax.random.split(key)
            new_normalizer_params, env_state, buffer_state = get_experience(
                training_state.normalizer_params,
                training_state.policy_params,
                env_state,
                buffer_state,
                key,
            )
            new_training_state = training_state.replace(
                normalizer_params=new_normalizer_params,
                env_steps=training_state.env_steps + env_steps_per_actor_step,
            )
            return (new_training_state, env_state, buffer_state, new_key), ()

        (training_state, env_state, buffer_state, _), _ = jax.lax.scan(
            f,
            (training_state, env_state, buffer_state, key),
            (),
            length=num_prefill_actor_steps,
        )
        return training_state, env_state, replay_buffers.unshard_view(buffer_state)

    prefill_replay_buffer_sm = mesh_utils.shard_map(
        prefill_replay_buffer,
        mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(AXIS), P(AXIS)),
    )
    prefill_replay_buffer = jax.jit(prefill_replay_buffer_sm)

    def training_epoch(training_state, env_state, buffer_state, key):
        key = jnp.squeeze(key, axis=0)
        buffer_state = replay_buffers.shard_view(buffer_state)

        def f(carry, unused_t):
            ts, es, bs, k = carry
            k, new_key = jax.random.split(k)
            ts, es, bs, metrics = training_step(ts, es, bs, k)
            return (ts, es, bs, new_key), metrics

        (training_state, env_state, buffer_state, _), metrics = jax.lax.scan(
            f,
            (training_state, env_state, buffer_state, key),
            (),
            length=num_training_steps_per_epoch,
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        metrics = jax.lax.pmean(metrics, axis_name=AXIS)
        return training_state, env_state, replay_buffers.unshard_view(buffer_state), metrics

    training_epoch_sm = mesh_utils.shard_map(
        training_epoch,
        mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P(AXIS), P(AXIS), P()),
    )
    training_epoch = jax.jit(training_epoch_sm, donate_argnums=(0, 1, 2))

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, env_state, buffer_state, key):
        nonlocal training_walltime
        t = time.time()
        training_state, env_state, buffer_state, metrics = training_epoch(
            training_state, env_state, buffer_state, key
        )
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)

        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (
            env_steps_per_actor_step * num_training_steps_per_epoch
        ) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": value for name, value in metrics.items()},
        }
        return training_state, env_state, buffer_state, metrics

    global_key, local_key = jax.random.split(jax.random.PRNGKey(seed))
    local_key = jax.random.fold_in(local_key, jax.process_index())

    # learner state (replicated)
    key_policy, key_q = jax.random.split(global_key)
    del global_key

    # one jitted program for the whole initial TrainingState (see ppo.train:
    # eager init is hundreds of per-op RPCs over a tunneled TPU)
    def _init_training_state(key_policy, key_q):
        log_alpha = jnp.asarray(0.0, dtype=jnp.float32)
        policy_params = sac_network.policy_network.init(key_policy)
        q_params = sac_network.q_network.init(key_q)
        return TrainingState(
            policy_optimizer_state=policy_optimizer.init(policy_params),
            policy_params=policy_params,
            q_optimizer_state=q_optimizer.init(q_params),
            q_params=q_params,
            target_q_params=q_params,
            gradient_steps=jnp.zeros(()),
            env_steps=jnp.zeros(()),
            alpha_optimizer_state=alpha_optimizer.init(log_alpha),
            alpha_params=log_alpha,
            normalizer_params=running_statistics.init_state(
                running_statistics.ArraySpec((obs_size,), jnp.float32)
            ),
        )

    training_state = jax.jit(_init_training_state)(key_policy, key_q)
    # full-state checkpointing (both optimizers + alpha + normalizer + step
    # counters) mirroring ppo/train.py:320-346; the replay buffer is NOT
    # checkpointed (it is shard-local and max_replay_size-large) — a resumed
    # run refills it through the usual min_replay_size prefill
    checkpointer = None
    if checkpoint_dir or restore_checkpoint_path:
        import os

        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        if restore_checkpoint_path is None and checkpoint_dir:
            if os.path.isdir(checkpoint_dir):
                steps = sorted(
                    d for d in os.listdir(checkpoint_dir) if d.startswith("step_")
                )
                if steps:
                    restore_checkpoint_path = os.path.join(
                        os.path.abspath(checkpoint_dir), steps[-1]
                    )
        if restore_checkpoint_path:
            training_state = checkpointer.restore(
                restore_checkpoint_path,
                jax.tree_util.tree_map(
                    lambda x: ocp.utils.to_shape_dtype_struct(x), training_state
                ),
            )
    training_state = mesh_utils.put_replicated(training_state, mesh)

    local_key, rb_key, env_key, eval_key = jax.random.split(local_key, 4)
    env_keys = jax.random.split(env_key, num_envs)
    if aot_cache:
        from brax_tpu import aot

        _env_sharding = mesh_utils.env_sharded(mesh)

        def _reset_sharded(keys):
            return jax.lax.with_sharding_constraint(
                env.reset(keys), _env_sharding
            )

        reset_fn, _ = aot.cached_call(
            _reset_sharded,
            f"sac_reset_{aot_fp}",
            (mesh_utils.put_env_sharded(env_keys, mesh),),
        )
    else:
        reset_fn = jax.jit(
            env.reset, out_shardings=mesh_utils.env_sharded(mesh)
        )
    env_state = reset_fn(mesh_utils.put_env_sharded(env_keys, mesh))
    buffer_state = mesh_utils.put_env_sharded(
        replay_buffers.init_sharded(replay_buffer, rb_key, device_count), mesh
    )

    if aot_cache:
        _example_keys = mesh_utils.put_env_sharded(
            jax.random.split(jax.random.PRNGKey(0), device_count), mesh
        )
        prefill_replay_buffer, _ = aot.cached_call(
            prefill_replay_buffer_sm,
            f"sac_prefill_{aot_fp}",
            (training_state, env_state, buffer_state, _example_keys),
        )
        training_epoch, _ = aot.cached_call(
            training_epoch_sm,
            f"sac_epoch_{aot_fp}",
            (training_state, env_state, buffer_state, _example_keys),
            donate_argnums=(0, 1, 2),
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
        aot_key=f"sac_{aot_fp}" if aot_cache else None,
    )

    metrics = {}
    if jax.process_index() == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.policy_params),
            training_metrics={},
        )
        progress_fn(0, metrics)

    t = time.time()
    prefill_key, local_key = jax.random.split(local_key)
    prefill_keys = mesh_utils.put_env_sharded(
        jax.random.split(prefill_key, device_count), mesh
    )
    training_state, env_state, buffer_state = prefill_replay_buffer(
        training_state, env_state, buffer_state, prefill_keys
    )
    training_walltime = time.time() - t

    current_step = 0
    for _ in range(num_evals_after_init):
        epoch_key, local_key = jax.random.split(local_key)
        epoch_keys = mesh_utils.put_env_sharded(
            jax.random.split(epoch_key, device_count), mesh
        )
        (
            training_state,
            env_state,
            buffer_state,
            training_metrics,
        ) = training_epoch_with_timing(training_state, env_state, buffer_state, epoch_keys)
        current_step = int(training_state.env_steps)

        if jax.process_index() == 0:
            if checkpoint_logdir:
                from brax_tpu.io import model

                params = (training_state.normalizer_params, training_state.policy_params)
                model.save_params(f"{checkpoint_logdir}_sac_{current_step}.pkl", params)
            if checkpointer is not None and checkpoint_dir:
                import os

                path = os.path.join(
                    os.path.abspath(checkpoint_dir), f"step_{current_step:012d}"
                )
                checkpointer.save(path, training_state)
                checkpointer.wait_until_finished()
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.policy_params),
                training_metrics,
            )
            progress_fn(current_step, metrics)

    total_steps = current_step
    assert total_steps >= num_timesteps

    params = (training_state.normalizer_params, training_state.policy_params)
    mesh_utils.synchronize_hosts()
    _sim_kernels.enable(_prev_kernel_enabled)
    _g_kernels.enable(_prev_g_kernel_enabled)
    _fused_mlp.enable(_prev_mlp_enabled)
    return (make_policy, params, metrics)
