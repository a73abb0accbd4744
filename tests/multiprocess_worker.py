"""Worker for tests/test_multiprocess.py: one process of an N-process
jax.distributed CPU job (4 virtual devices each).

Runs, in order:
  1. jax.distributed.initialize against the test's coordinator
  2. a cross-process psum sanity check (the DCN-analog collective)
  3. PPO on the `fast` env over the GLOBAL 8-device mesh — exercises
     per-process key folding, process-spanning shard_map collectives,
     eval-on-process-0, and synchronize_hosts
  4. mesh-equivalence invariant: the final replicated param fingerprint is
     written out; the test asserts all processes agree (and that the
     process_count=1 run of the same config matches too)
  5. ES/ARS multi-host guards raise

Writes a json result file; exits 0 on success.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, num_procs, pid, out_path = sys.argv[1:5]
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(num_procs),
        process_id=int(pid),
    )
    import jax.numpy as jnp

    res = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }

    # 2. cross-process collective
    from jax.experimental import multihost_utils

    val = multihost_utils.process_allgather(jnp.asarray(jax.process_index()))
    res["allgather"] = [int(v) for v in val]

    # 3. tiny PPO over the global mesh
    from brax_tpu import envs
    from brax_tpu.training import mesh_utils
    from brax_tpu.training.agents.ppo import train as ppo

    mesh = mesh_utils.create_mesh()
    res["mesh_size"] = mesh.size

    evals_seen = []

    def progress(step, metrics):
        evals_seen.append(int(step))

    make_policy, params, metrics = ppo.train(
        environment=envs.create("fast", auto_reset=False),
        num_timesteps=512,
        episode_length=32,
        num_envs=16,
        learning_rate=3e-4,
        entropy_cost=1e-2,
        discounting=0.95,
        unroll_length=4,
        batch_size=16,
        num_minibatches=2,
        num_updates_per_batch=1,
        num_evals=2,
        num_eval_envs=8,
        normalize_observations=True,
        seed=0,
        mesh=mesh,
        progress_fn=progress,
    )
    # eval runs on process 0 only (reference ppo/train.py:300,321 parity)
    res["num_evals_seen"] = len(evals_seen)
    res["final_eval_reward"] = (
        float(metrics.get("eval/episode_reward", float("nan")))
        if metrics
        else None
    )

    # 4. replicated-params fingerprint: identical across processes
    leaves = jax.tree_util.tree_leaves(params)
    fp = float(
        sum(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32))) for x in leaves)
    )
    res["param_fingerprint"] = fp

    # 5. population trainers refuse multi-host (es/train.py:99 parity with
    # the reference's explicit unsupported-multihost guard)
    if jax.process_count() > 1:
        from brax_tpu.training.agents.ars import train as ars
        from brax_tpu.training.agents.es import train as es

        for mod, name in ((es, "es"), (ars, "ars")):
            try:
                mod.train(
                    environment=envs.create("fast", auto_reset=False),
                    num_timesteps=64,
                    episode_length=16,
                )
                res[f"{name}_guard"] = "MISSING"
            except (NotImplementedError, ValueError, AssertionError):
                res[f"{name}_guard"] = "raised"

    mesh_utils.synchronize_hosts()
    with open(out_path, "w") as f:
        json.dump(res, f)


if __name__ == "__main__":
    main()
