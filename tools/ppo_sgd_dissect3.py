"""Validate the HBM-bound hypothesis for PPO SGD: bf16-activation variant.

If 32x minibatch fwd+bwd is activation-bandwidth-bound (~160MB/iter f32),
casting activations (not params) to bf16 should approach 2x.  Also times
the cheap shuffle fix (one permutation-index computation + take per leaf).

Prints RESULT json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from brax_tpu.compilation_cache import enable_compilation_cache


def timed(fn, args0, n=8, chain=True):
    out = fn(*args0)
    out = fn(*out[:2], args0[2]) if chain else fn(*args0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*out[:2], args0[2]) if chain else fn(*args0)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0

    B, T, OBS, ACT = 1024, 5, 87, 8
    NMB = 32
    key = jax.random.PRNGKey(0)

    import flax.linen as nn

    class MLP(nn.Module):
        feats: tuple
        dtype: object = jnp.float32

        @nn.compact
        def __call__(self, x):
            x = x.astype(self.dtype)
            for i, f in enumerate(self.feats):
                x = nn.Dense(f, dtype=self.dtype, param_dtype=jnp.float32)(x)
                if i < len(self.feats) - 1:
                    x = nn.swish(x)
            return x.astype(jnp.float32)

    obs = jax.random.normal(key, (NMB, B, T, OBS))
    optimizer = optax.adam(3e-4)

    r = {}
    for name, dt in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        value = MLP((256,) * 5 + (1,), dtype=dt)
        policy = MLP((32,) * 4 + (2 * ACT,), dtype=dt)
        vp = value.init(key, obs[0])
        pp = policy.init(key, obs[0])
        params = {"v": vp, "p": pp}
        opt_state = jax.jit(optimizer.init)(params)

        def loss(params, o):
            return jnp.mean(value.apply(params["v"], o)) + jnp.mean(
                policy.apply(params["p"], o)
            )

        grad_fn = jax.value_and_grad(loss)

        @jax.jit
        def scan32(opt_state, params, obs):
            def body(carry, o):
                os_, p = carry
                _, g = grad_fn(p, o)
                up, os_ = optimizer.update(g, os_)
                p = optax.apply_updates(p, up)
                return (os_, p), ()
            (os_, p), _ = jax.lax.scan(body, (opt_state, params), obs)
            return os_, p, obs

        ms = timed(scan32, (opt_state, params, obs)) * 1e3
        r[f"nets_{name}_ms"] = round(ms, 2)
        r[f"nets_{name}_us_per_iter"] = round(ms * 1000 / NMB, 1)

    # shuffle: per-leaf permutation (old) vs one index-permutation + take
    leaves = {
        "obs": jax.random.normal(key, (32768, T, OBS)),
        "nobs": jax.random.normal(key, (32768, T, OBS)),
        "act": jax.random.normal(key, (32768, T, ACT)),
        "raw": jax.random.normal(key, (32768, T, ACT)),
        "lp": jax.random.normal(key, (32768, T)),
        "rew": jax.random.normal(key, (32768, T)),
        "disc": jax.random.normal(key, (32768, T)),
        "trunc": jax.random.normal(key, (32768, T)),
    }

    @jax.jit
    def shuf_old(data, key):
        return jax.tree_util.tree_map(
            lambda x: jax.random.permutation(key, x), data
        )

    @jax.jit
    def shuf_idx(data, key):
        idx = jax.random.permutation(key, data["obs"].shape[0])
        return jax.tree_util.tree_map(lambda x: jnp.take(x, idx, axis=0), data)

    for name, f in [("old", shuf_old), ("idx", shuf_idx)]:
        out = f(leaves, key)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(8):
            out = f(out, jax.random.fold_in(key, i))
        jax.block_until_ready(out)
        r[f"shuffle_{name}_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    print("RESULT " + json.dumps(r))


if __name__ == "__main__":
    main()
