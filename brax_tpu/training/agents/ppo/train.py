"""Proximal policy optimization, TPU-native.

One jitted SPMD program per epoch: rollout + normalizer update + SGD run
inside `shard_map` over a 1-D device mesh (axis 'i' = env/data axis).  Env
state lives sharded along the env axis; params/optimizer state are replicated;
gradients/statistics sync via `lax.pmean`/`psum` over ICI.  This replaces the
reference's pmap architecture (/root/reference/brax/training/agents/ppo/
train.py:61-340) with GSPMD-era idioms; algorithmic content is identical.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as onp
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
    """Learner state."""

    optimizer_state: optax.OptState
    params: ppo_losses.PPONetworkParams
    normalizer_params: running_statistics.RunningStatisticsState
    env_steps: jnp.ndarray
    # optional auxiliary learner (e.g. braxlines discriminators)
    extra_params: Optional[Params] = None
    extra_optimizer_state: Optional[optax.OptState] = None


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
    network_factory: types.NetworkFactory = ppo_networks.make_ppo_networks,
    progress_fn: Callable[[int, Metrics], None] = lambda *args: None,
    normalize_advantage: bool = True,
    eval_env: Optional[envs.Env] = None,
    mesh=None,
    extra_params: Optional[Params] = None,
    extra_loss_fn=None,
    extra_learning_rate: float = 3e-4,
    reward_relabel_fn=None,
    checkpoint_dir: Optional[str] = None,
    restore_checkpoint_path: Optional[str] = None,
    profiler_dir: Optional[str] = None,
    use_fused_kernel: Optional[bool] = None,
    aot_cache: bool = False,
):
    """PPO training; returns (make_policy, params, metrics).

    Auxiliary-learner hooks (used by brax_tpu.braxlines): `extra_params` are
    trained each step by `extra_loss_fn(extra_params, transitions, rng)`
    (pmean-synced), and `reward_relabel_fn(extra_params, transitions) ->
    rewards` replaces batch rewards before the PPO update (how discriminator
    rewards reach the policy without env recompilation)."""
    assert batch_size * num_minibatches % num_envs == 0
    xt = time.time()

    # cold-start decomposition at INFO level (logger "brax_tpu.training.ppo"):
    # production restarts care where the first minutes go — tracing, compile
    # cache loads, or tunnel transfers — and this is the only seam that sees
    # all of them
    import logging

    _log = logging.getLogger("brax_tpu.training.ppo")

    def _mark(label):
        _log.info("startup +%.1fs: %s", time.time() - xt, label)

    # aot_cache=True: the three jitted programs (reset, eval unroll,
    # training epoch) round-trip the on-disk StableHLO cache (brax_tpu.aot),
    # so warm restarts skip minutes of Python tracing of the fused-kernel
    # graphs.  The cached epoch donates (training_state, env_state) just
    # like the plain-jit path (aot.cached_call donate_argnums).  Keyed on
    # every trainer hyperparameter + the System content.
    aot_fp = None
    if aot_cache:
        from brax_tpu import aot

        _mark("fingerprinting hyperparameters")
        aot_fp = aot.fingerprint(
            "ppo",
            num_timesteps, episode_length, action_repeat, num_envs,
            num_eval_envs, learning_rate, entropy_cost, discounting,
            unroll_length, batch_size, num_minibatches,
            num_updates_per_batch, num_evals, normalize_observations,
            reward_scaling, clipping_epsilon, gae_lambda,
            deterministic_eval, normalize_advantage, use_fused_kernel,
            aot.fingerprint_callable(network_factory),
            aot.fingerprint_callable(extra_loss_fn),
            aot.fingerprint_callable(reward_relabel_fn),
            extra_learning_rate,
            type(environment).__module__ + "." + type(environment).__qualname__,
            aot.fingerprint_pytree(getattr(environment, "sys", None)),
        )
        _mark("aot fingerprint computed")

    # fused Pallas physics in the rollout: 2x faster end-to-end training on
    # TPU (4.55M vs 2.30M env-steps/s, ant@2048, same learning curves).
    # None = auto-enable on TPU; numerics match the XLA path to float32
    # round-off.  Explicit False opts out.
    from brax_tpu.sim import kernels as sim_kernels
    from brax_tpu.training import fused_mlp
    from brax_tpu.v2.generalized import kernels as g_kernels

    if use_fused_kernel is None:
        use_fused_kernel = jax.default_backend() == "tpu"
    _prev_kernel_enabled = sim_kernels.enabled()
    _prev_g_kernel_enabled = g_kernels.enabled()
    _prev_mlp_enabled = fused_mlp.enabled()
    sim_kernels.enable(bool(use_fused_kernel))
    g_kernels.enable(bool(use_fused_kernel))
    # fused_mlp (single-call MLP fwd/bwd) measured AT PARITY with XLA here
    # (HW_r05/probe_fused_mlp.log: 171 vs 164 us fwd+bwd) because every
    # pallas_call costs ~75-110 us fixed on this chip
    # (HW_r05/probe_pallas_overhead.log) — not enabled by default

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

    # v2 (generalized-coordinate) envs use their own wrapper stack; same
    # trainer otherwise (reference v2/training/agents/ppo/train.py:105-110)
    _wrap = wrappers.wrap_for_training_any
    _mark("fingerprint + kernel setup done")
    env = _wrap(
        environment, episode_length=episode_length, action_repeat=action_repeat
    )
    _mark("env wrapped")

    normalize = lambda x, y: x
    if normalize_observations:
        normalize = running_statistics.normalize
    _obs_size, _act_size = env.observation_size, env.action_size
    _mark("obs/action sizes resolved")
    ppo_network = network_factory(
        _obs_size, _act_size, preprocess_observations_fn=normalize
    )
    make_policy = ppo_networks.make_inference_fn(ppo_network)

    optimizer = optax.adam(learning_rate=learning_rate)

    loss_fn = functools.partial(
        ppo_losses.compute_ppo_loss,
        ppo_network=ppo_network,
        entropy_cost=entropy_cost,
        discounting=discounting,
        reward_scaling=reward_scaling,
        gae_lambda=gae_lambda,
        clipping_epsilon=clipping_epsilon,
        normalize_advantage=normalize_advantage,
    )

    gradient_update_fn = gradients.gradient_update_fn(
        loss_fn, optimizer, pmap_axis_name=AXIS, has_aux=True
    )

    extra_optimizer = optax.adam(learning_rate=extra_learning_rate)
    extra_update_fn = None
    if extra_loss_fn is not None:
        extra_update_fn = gradients.gradient_update_fn(
            extra_loss_fn, extra_optimizer, pmap_axis_name=AXIS, has_aux=False
        )

    def minibatch_step(carry, data: types.Transition, normalizer_params):
        optimizer_state, params, key = carry
        key, key_loss = jax.random.split(key)
        (_, metrics), params, optimizer_state = gradient_update_fn(
            params, normalizer_params, data, key_loss, optimizer_state=optimizer_state
        )
        return (optimizer_state, params, key), metrics

    def sgd_step(carry, unused_t, data: types.Transition, normalizer_params):
        optimizer_state, params, key = carry
        key, key_perm, key_grad = jax.random.split(key, 3)

        def convert_data(x: jnp.ndarray):
            # shard-local shuffle: no cross-device traffic in the SGD loop
            x = jax.random.permutation(key_perm, x)
            x = jnp.reshape(x, (num_minibatches, -1) + x.shape[1:])
            return x

        shuffled_data = jax.tree_util.tree_map(convert_data, data)
        (optimizer_state, params, _), metrics = jax.lax.scan(
            functools.partial(minibatch_step, normalizer_params=normalizer_params),
            (optimizer_state, params, key_grad),
            shuffled_data,
            length=num_minibatches,
        )
        return (optimizer_state, params, key), metrics

    def training_step(carry, unused_t):
        training_state, state, key = carry
        key_sgd, key_generate_unroll, new_key = jax.random.split(key, 3)

        policy = make_policy(
            (training_state.normalizer_params, training_state.params.policy)
        )

        def f(carry, unused_t):
            current_state, current_key = carry
            current_key, next_key = jax.random.split(current_key)
            next_state, data = acting.generate_unroll(
                env,
                current_state,
                policy,
                current_key,
                unroll_length,
                extra_fields=("truncation",),
            )
            return (next_state, next_key), data

        (state, _), data = jax.lax.scan(
            f,
            (state, key_generate_unroll),
            (),
            length=batch_size * num_minibatches // num_envs,
        )
        # leading dims -> (batch_size * num_minibatches / device_count, unroll_length)
        data = jax.tree_util.tree_map(lambda x: jnp.swapaxes(x, 1, 2), data)
        data = jax.tree_util.tree_map(
            lambda x: jnp.reshape(x, (-1,) + x.shape[2:]), data
        )

        normalizer_params = running_statistics.update(
            training_state.normalizer_params,
            data.observation,
            pmap_axis_name=AXIS,
        )

        new_extra_params = training_state.extra_params
        new_extra_opt_state = training_state.extra_optimizer_state
        if extra_update_fn is not None:
            key_extra, key_sgd = jax.random.split(key_sgd)
            _, new_extra_params, new_extra_opt_state = extra_update_fn(
                training_state.extra_params,
                data,
                key_extra,
                optimizer_state=training_state.extra_optimizer_state,
            )
        if reward_relabel_fn is not None:
            data = data._replace(
                reward=reward_relabel_fn(new_extra_params, data)
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
            extra_params=new_extra_params,
            extra_optimizer_state=new_extra_opt_state,
        )
        return (new_training_state, state, new_key), metrics

    def training_epoch(training_state: TrainingState, state: envs.State, key: PRNGKey):
        # key arrives per-shard with a leading length-1 axis
        key = jnp.squeeze(key, axis=0)
        (training_state, state, _), loss_metrics = jax.lax.scan(
            training_step,
            (training_state, state, key),
            (),
            length=num_training_steps_per_epoch,
        )
        loss_metrics = jax.tree_util.tree_map(jnp.mean, loss_metrics)
        loss_metrics = jax.lax.pmean(loss_metrics, axis_name=AXIS)
        return training_state, state, loss_metrics

    training_epoch_sm = mesh_utils.shard_map(
        training_epoch,
        mesh,
        in_specs=(P(), P(AXIS), P(AXIS)),
        out_specs=(P(), P(AXIS), P()),
    )
    training_epoch = jax.jit(training_epoch_sm, donate_argnums=(0, 1))

    training_walltime = 0.0

    def training_epoch_with_timing(training_state, env_state, key):
        nonlocal training_walltime
        t = time.time()
        training_state, env_state, metrics = training_epoch(training_state, env_state, key)
        metrics = jax.tree_util.tree_map(jnp.mean, metrics)
        jax.tree_util.tree_map(lambda x: x.block_until_ready(), metrics)

        epoch_training_time = time.time() - t
        training_walltime += epoch_training_time
        sps = (
            num_training_steps_per_epoch * env_step_per_training_step
        ) / epoch_training_time
        metrics = {
            "training/sps": sps,
            "training/walltime": training_walltime,
            **{f"training/{name}": value for name, value in metrics.items()},
        }
        return training_state, env_state, metrics

    key = jax.random.PRNGKey(seed)
    global_key, local_key = jax.random.split(key)
    del key
    local_key, key_env, eval_key = jax.random.split(local_key, 3)
    key_policy, key_value = jax.random.split(global_key)
    del global_key

    _mark("initializing network params")

    # ONE jitted program for the whole initial TrainingState: eager flax /
    # optax init dispatches hundreds of tiny ops, each a blocking RPC over a
    # tunneled TPU (~15s measured); a single compiled program is one call
    # (and a persistent-compile-cache hit on warm starts)
    def _init_training_state(key_policy, key_value):
        init_params = ppo_losses.PPONetworkParams(
            policy=ppo_network.policy_network.init(key_policy),
            value=ppo_network.value_network.init(key_value),
        )
        return TrainingState(
            optimizer_state=optimizer.init(init_params),
            params=init_params,
            normalizer_params=running_statistics.init_state(
                running_statistics.ArraySpec((env.observation_size,), jnp.float32)
            ),
            env_steps=jnp.zeros(()),
            extra_params=extra_params,
            extra_optimizer_state=(
                extra_optimizer.init(extra_params)
                if extra_loss_fn is not None
                else None
            ),
        )

    training_state = jax.jit(_init_training_state)(key_policy, key_value)
    _mark("network params initialized")
    # full-state checkpointing (optimizer + normalizer + step counter), an
    # upgrade over the reference's params-only pickles (io/model.py:23-32):
    # training resumes exactly where it stopped
    checkpointer = None
    if checkpoint_dir or restore_checkpoint_path:
        import os

        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        if restore_checkpoint_path is None and checkpoint_dir:
            # auto-resume from the newest checkpoint in the directory
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
    _mark("params initialized + replicated")

    key_envs = jax.random.split(key_env, num_envs)
    if aot_cache:
        from brax_tpu import aot

        _env_sharding = mesh_utils.env_sharded(mesh)

        def _reset_sharded(keys):
            return jax.lax.with_sharding_constraint(
                env.reset(keys), _env_sharding
            )

        reset_fn, _ = aot.cached_call(
            _reset_sharded,
            f"ppo_reset_{aot_fp}",
            (mesh_utils.put_env_sharded(key_envs, mesh),),
        )
    else:
        reset_fn = jax.jit(
            env.reset, out_shardings=mesh_utils.env_sharded(mesh)
        )
    _mark("reset program ready")
    env_state = reset_fn(mesh_utils.put_env_sharded(key_envs, mesh))
    jax.block_until_ready(env_state.obs)
    _mark("reset executed")

    if aot_cache:
        # swap the donating jit for the AOT-cached epoch program now that a
        # concrete (training_state, env_state, keys) example exists
        _example_keys = mesh_utils.put_env_sharded(
            jax.random.split(jax.random.PRNGKey(0), device_count), mesh
        )
        training_epoch, _ = aot.cached_call(
            training_epoch_sm,
            f"ppo_epoch_{aot_fp}",
            (training_state, env_state, _example_keys),
            donate_argnums=(0, 1),
        )
        _mark("training epoch program ready")

    if not eval_env:
        eval_env = env
    else:
        eval_env = _wrap(
            eval_env, episode_length=episode_length, action_repeat=action_repeat
        )

    evaluator = acting.Evaluator(
        eval_env,
        functools.partial(make_policy, deterministic=deterministic_eval),
        num_eval_envs=num_eval_envs,
        episode_length=episode_length,
        action_repeat=action_repeat,
        key=eval_key,
        aot_key=f"ppo_{aot_fp}" if aot_cache else None,
    )

    _mark("evaluator ready")
    metrics = {}
    if jax.process_index() == 0 and num_evals > 1:
        metrics = evaluator.run_evaluation(
            (training_state.normalizer_params, training_state.params.policy),
            training_metrics={},
        )
        progress_fn(0, metrics)
        _mark("first eval done")

    current_step = 0
    for it in range(num_evals_after_init):
        epoch_key, local_key = jax.random.split(local_key)
        epoch_keys = mesh_utils.put_env_sharded(
            jax.random.split(epoch_key, device_count), mesh
        )
        # profile the second epoch (first is dominated by jit compilation):
        # a device trace viewable in tensorboard/xprof (SURVEY §5 rebuild
        # note — the reference has no profiler integration)
        if profiler_dir and it == 1 and jax.process_index() == 0:
            with jax.profiler.trace(profiler_dir):
                training_state, env_state, training_metrics = (
                    training_epoch_with_timing(
                        training_state, env_state, epoch_keys
                    )
                )
        else:
            training_state, env_state, training_metrics = (
                training_epoch_with_timing(training_state, env_state, epoch_keys)
            )
        current_step = int(training_state.env_steps)

        if jax.process_index() == 0:
            metrics = evaluator.run_evaluation(
                (training_state.normalizer_params, training_state.params.policy),
                training_metrics,
            )
            progress_fn(current_step, metrics)
            if checkpoint_dir:
                import os

                path = os.path.join(
                    os.path.abspath(checkpoint_dir), f"step_{current_step:012d}"
                )
                checkpointer.save(path, training_state)
                checkpointer.wait_until_finished()

    total_steps = current_step
    assert total_steps >= num_timesteps

    params = (training_state.normalizer_params, training_state.params.policy)
    if extra_loss_fn is not None:
        params = params + (training_state.extra_params,)
    mesh_utils.synchronize_hosts()
    sim_kernels.enable(_prev_kernel_enabled)
    g_kernels.enable(_prev_g_kernel_enabled)
    fused_mlp.enable(_prev_mlp_enabled)
    return (make_policy, params, metrics)
