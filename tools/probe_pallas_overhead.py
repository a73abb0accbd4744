"""Decompose pallas_call fixed costs on this chip.

  trivial    copy [8,128] kernel, scanned: per-call floor
  gridN      same kernel with grid=(N,) no-op steps: per-grid-step cost
  fwd1       value-net fwd, ONE grid step (tile=whole 5120 rows)
  fwd10      value-net fwd, 10 grid steps (tile 512)
  dotchain   kernel with K dependent [512,256]@[256,256] dots: per-dot latency

Usage: python tools/probe_pallas_overhead.py
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brax_tpu.compilation_cache import enable_compilation_cache


def scan_time(step, x0, n=8, length=64):
    @jax.jit
    def run(x):
        def body(c, _):
            return step(c), ()
        c, _ = jax.lax.scan(body, x, (), length=length)
        return c

    c = run(x0)
    jax.block_until_ready(c)
    t0 = time.perf_counter()
    for _ in range(n):
        c = run(c)
    jax.block_until_ready(c)
    return (time.perf_counter() - t0) / n / length * 1e6


def main():
    enable_compilation_cache()
    assert float(jnp.ones(8).sum()) == 8.0
    r = {}

    def copy_k(x_ref, o_ref):
        o_ref[:] = x_ref[:] + 1.0

    def trivial(x):
        return pl.pallas_call(
            copy_k,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    r["trivial_us"] = scan_time(trivial, jnp.zeros((8, 128)))

    def gridded(x, n):
        return pl.pallas_call(
            copy_k,
            grid=(n,),
            in_specs=[pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x)

    for n in (10, 40):
        r[f"grid{n}_us"] = scan_time(functools.partial(gridded, n=n), jnp.zeros((8, 128)))

    # dependent dot chain
    def chain_k(k, x_ref, w_ref, o_ref):
        h = x_ref[:]
        for _ in range(k):
            h = jnp.dot(
                h.astype(jnp.bfloat16), w_ref[:].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        o_ref[:] = h

    def dotchain(x, w, k):
        return pl.pallas_call(
            functools.partial(chain_k, k),
            out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 256)) * 0.05
    x0 = jnp.ones((512, 256))
    for k in (6, 24):
        r[f"dotchain{k}_us"] = scan_time(
            functools.partial(dotchain, w=w, k=k), x0, length=32
        )
    # same chain on 5120 rows
    def dotchain5120(x, w, k):
        return pl.pallas_call(
            functools.partial(chain_k, k),
            out_shape=jax.ShapeDtypeStruct((5120, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    x5 = jnp.ones((5120, 256))
    for k in (6, 24):
        r[f"dotchain5120_{k}_us"] = scan_time(
            functools.partial(dotchain5120, w=w, k=k), x5, length=32
        )

    # value-net fwd single grid step vs 10
    from brax_tpu.training import fused_mlp, networks

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (5120, 87))
    mlp = networks.MLP(layer_sizes=[256] * 5 + [1], activation=jax.nn.swish)
    params = mlp.init(key, x)
    kernels, biases = fused_mlp.flax_mlp_params(params)
    for tile, name in ((5120, "fwd1"), (512, "fwd10")):
        fused_mlp._TILE_N = tile
        fused_mlp._get_op.cache_clear()

        def f_fwd(c):
            y = fused_mlp.dense_chain(x, kernels, biases, activation="swish")
            return c + 0.0 * jnp.mean(y)

        r[f"{name}_us"] = scan_time(f_fwd, jnp.zeros(()), length=32)
        print(json.dumps({k: round(v, 2) for k, v in r.items()}), flush=True)
    fused_mlp._TILE_N = 512
    fused_mlp._get_op.cache_clear()

    print("RESULT " + json.dumps({k: round(v, 2) for k, v in r.items()}))


if __name__ == "__main__":
    main()
