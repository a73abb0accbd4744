"""Isolate fused_mlp kernel cost on TPU: fwd and fwd+bwd vs flax/XLA,
scanned x32 (dispatch-free), across row-tile sizes.

Usage: python tools/probe_fused_mlp.py
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from brax_tpu.compilation_cache import enable_compilation_cache
from brax_tpu.training import fused_mlp, networks


def scan_time(make_step, carry0, n=8):
    @jax.jit
    def run(carry):
        def body(c, _):
            return make_step(c), ()
        c, _ = jax.lax.scan(body, carry, (), length=32)
        return c

    c = run(carry0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = run(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / n / 32 * 1e6  # us per iteration


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0
    key = jax.random.PRNGKey(0)
    N, OBS = 5120, 87
    x = jax.random.normal(key, (N, OBS))
    mlp = networks.MLP(layer_sizes=[256] * 5 + [1], activation=jax.nn.swish)
    params = mlp.init(key, x)
    kernels, biases = fused_mlp.flax_mlp_params(params)
    r = {}

    # flax/XLA baselines
    r["flax_fwd_us"] = scan_time(
        lambda c: c + jnp.mean(mlp.apply(params, x)) * 0.0, jnp.zeros(())
    )
    g_ref = jax.grad(lambda p, c: jnp.mean(mlp.apply(p, x) * c))

    def xla_step(c):
        g = g_ref(params, c)
        return c + 0.0 * jnp.mean(g["params"]["hidden_0"]["kernel"])

    r["flax_fwdbwd_us"] = scan_time(xla_step, jnp.ones(()))

    for tile in (256, 512, 1024):
        fused_mlp._TILE_N = tile

        def f_fwd(c):
            y = fused_mlp.dense_chain(x, kernels, biases, activation="swish")
            return c + 0.0 * jnp.mean(y)

        r[f"fused_fwd_t{tile}_us"] = scan_time(f_fwd, jnp.zeros(()))
        print(json.dumps(r), flush=True)
        fused_mlp._get_op.cache_clear()

        def loss(kb, c):
            k, b = kb
            return jnp.mean(fused_mlp.dense_chain(x, k, b, activation="swish") * c)

        gf = jax.grad(loss)

        def f_fwdbwd(c):
            gk, gb = gf((kernels, biases), c)
            return c + 0.0 * jnp.mean(gk[0])

        r[f"fused_fwdbwd_t{tile}_us"] = scan_time(f_fwdbwd, jnp.ones(()))
        print(json.dumps(r), flush=True)
        fused_mlp._get_op.cache_clear()

    print("RESULT " + json.dumps({k: round(v, 1) for k, v in r.items()}))


if __name__ == "__main__":
    main()
