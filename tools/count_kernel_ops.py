"""Trace the fused generalized kernel body and count element-ops.

Static-shape jaxpr op census: for each equation, charge the number of output
elements (a proxy for VPU work — every op in the kernel is elementwise on
(..., S, L) tiles).  Splits the total by the pipeline stage that emitted it
(tagged via jax.named_scope) so the optimization effort goes where the ops
are.  CPU-only; no TPU needed.

Usage: JAX_PLATFORMS=cpu python tools/count_kernel_ops.py [env]
"""

import collections
import sys as _sys

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu.v2.generalized import kernels as gk


def census(closed_jaxpr, depth=0, scope=""):
    """Yield (scope, prim_name, n_out_elements) for every eqn, recursing."""
    for eqn in closed_jaxpr.jaxpr.eqns:
        name = eqn.primitive.name
        if name in ("scan", "while", "cond", "pjit", "custom_vjp_call",
                    "custom_jvp_call", "closed_call", "core_call"):
            inner = None
            for k in ("jaxpr", "call_jaxpr", "branches", "body_jaxpr"):
                if k in eqn.params:
                    inner = eqn.params[k]
                    break
            mult = 1
            if name == "scan":
                mult = eqn.params.get("length", 1)
            elif name == "while":
                mult = 1  # unknown trip count; report once
            if inner is not None:
                inners = inner if isinstance(inner, (tuple, list)) else [inner]
                for ij in inners:
                    for s, p, n in census(ij, depth + 1, scope):
                        yield s, p, n * mult
            continue
        n = sum(int(onp.prod(v.aval.shape)) for v in eqn.outvars
                if hasattr(v, "aval"))
        st = str(eqn.source_info.name_stack) or scope
        yield st, name, n


def main():
    env_name = _sys.argv[1] if len(_sys.argv) > 1 else "ant"
    import brax_tpu.v2.envs as v2_envs
    env = v2_envs.create(env_name, backend="generalized")
    sys_ = env.sys
    n_frames = env._n_frames if hasattr(env, "_n_frames") else 5

    tile = (8, 128)
    tile_frames, p = gk._build_tile_frames(sys_, n_frames, tile)
    na = max(len(p.act_qdid), 1)
    args = (
        jnp.zeros((p.nq,) + tile), jnp.zeros((p.nd,) + tile),
        jnp.zeros((p.nd, p.nd) + tile), jnp.zeros((na,) + tile),
    )
    jpr = jax.make_jaxpr(lambda *a: tile_frames(*a))(*args)

    by_prim = collections.Counter()
    total = 0
    for _, prim, n in census(jpr):
        by_prim[prim] += n
        total += n

    envs_per_tile = tile[0] * tile[1]
    print(f"env={env_name} n_frames={n_frames} tile={tile} "
          f"nq={p.nq} nd={p.nd} nl={p.nl} nc={p.nc} nr={p.nr}")
    print(f"total element-ops per env-step tile: {total:,} "
          f"({total / envs_per_tile:,.0f} per env-step)")
    print("top primitives:")
    for prim, n in by_prim.most_common(20):
        print(f"  {prim:24s} {n:>12,}  ({100.0 * n / total:.1f}%)")


if __name__ == "__main__":
    main()
