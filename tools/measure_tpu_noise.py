"""Measure the reference's self-noise floor and our divergence ON TPU.

The r2 hardware capture showed the gated "TPU bit-exact" test failing at
max|dpos| 1.9e-5 (rel 4e-4) after 20 steps — i.e. the round-1 claim of
bit-exact TPU trajectories no longer holds under the current XLA. This tool
quantifies what IS true: the reference stepped against itself under two XLA
graph arrangements (plain jit loop vs vmap(batch=1)) on the same chip, vs
our divergence from it, over several horizons.

Usage: python tools/measure_tpu_noise.py
Prints one RESULT json line with {horizon: {self_noise, ours}}.
Parity target: /root/reference/brax/physics/system.py:254-325.
"""

import json
import sys

import jax
import numpy as np

sys.path.insert(0, "/root/repo")

from tests import reference

assert reference.setup(), "reference brax unavailable"

from brax.envs import ant as ref_ant  # noqa: E402

from brax_tpu.envs import ant as my_ant  # noqa: E402


def main():
    ref_env = ref_ant.Ant(use_contact_forces=True)
    my_env = my_ant.Ant(use_contact_forces=True)

    rng = jax.random.PRNGKey(42)
    key = jax.random.PRNGKey(7)
    acts = []
    for _ in range(100):
        key, k = jax.random.split(key)
        acts.append(jax.random.uniform(k, (8,), minval=-1, maxval=1))

    sA = jax.jit(ref_env.reset)(rng)
    stepA = jax.jit(ref_env.step)
    sB = jax.tree_util.tree_map(lambda x: x[None], jax.jit(ref_env.reset)(rng))
    stepB = jax.jit(jax.vmap(ref_env.step))
    sM = jax.jit(my_env.reset)(rng)
    stepM = jax.jit(my_env.step)

    out = {}
    horizons = {5, 10, 20, 50, 100}
    for i, a in enumerate(acts):
        sA = stepA(sA, a)
        sB = stepB(sB, a[None])
        sM = stepM(sM, a)
        n = i + 1
        if n in horizons:
            pA = np.asarray(sA.qp.pos)
            pB = np.asarray(sB.qp.pos)[0]
            pM = np.asarray(sM.qp.pos)
            out[n] = {
                "self_noise": float(np.abs(pA - pB).max()),
                "ours": float(np.abs(pA - pM).max()),
            }
            print(f"h={n}: ref-self {out[n]['self_noise']:.3e}  "
                  f"ours {out[n]['ours']:.3e}", flush=True)

    print("RESULT " + json.dumps({"backend": jax.default_backend(),
                                  "horizons": out}))


if __name__ == "__main__":
    main()
