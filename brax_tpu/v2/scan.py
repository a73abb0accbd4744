"""Static-plan scans over the kinematic tree and over link/actuator types.

Functional parity with reference brax/v2/scan.py.  The scan order (depth
levels, type groups, parent scatter maps) depends only on the System's static
fields, so it is computed once per call into a plain-Python plan and the scan
body unrolls at trace time — XLA sees straight-line code with static slices
and gathers, no dynamic control flow.
"""

from __future__ import annotations

from typing import Callable, Sequence, TypeVar

import jax
import jax.numpy as jnp

from brax_tpu.v2.base import Q_WIDTHS, QD_WIDTHS, System

Y = TypeVar("Y")


def _take(obj: Y, idxs: Sequence[int]) -> Y:
    """Takes static indices on a pytree, with contiguous-slice fast path.

    x[a:b] lowers to a no-copy slice while x[array] is a gather; detect
    contiguous index lists and slice (reference scan.py:29-50 does the same).
    """
    idxs = list(idxs)

    def take(x):
        if idxs == list(range(idxs[0], idxs[-1] + 1)):
            return x[idxs[0] : idxs[-1] + 1]
        return x.take(jnp.array(idxs), axis=0, mode="wrap")

    return jax.tree_util.tree_map(take, obj)


def _depths(parents: Sequence[int]):
    out = []
    for i in range(len(parents)):
        d, j = 0, i
        while parents[j] != -1:
            j = parents[j]
            d += 1
        out.append(d)
    return out


def _level_plan(sys: System):
    """Groups link/q/qd indices by tree depth."""
    depths = _depths(sys.link_parents)
    q_idx, qd_idx = 0, 0
    levels = []
    for i, t in enumerate(sys.link_types):
        d = depths[i]
        while d >= len(levels):
            levels.append({"l": [], "q": [], "d": []})
        levels[d]["l"].append(i)
        levels[d]["q"].extend(range(q_idx, q_idx + Q_WIDTHS[t]))
        levels[d]["d"].extend(range(qd_idx, qd_idx + QD_WIDTHS[t]))
        q_idx += Q_WIDTHS[t]
        qd_idx += QD_WIDTHS[t]
    return levels


def _reorder(y, order):
    if order != list(range(len(order))):
        y = _take(y, [order.index(i) for i in range(len(order))])
    return y


def tree(
    sys: System, f: Callable[..., Y], in_types: str, *args, reverse: bool = False
) -> Y:
    """Scans f over the kinematic tree one depth level at a time.

    Root-to-leaves by default (the carry y is each link's parent output,
    gathered by a static parent map); leaves-to-root with reverse=True (the
    carry is the scatter-sum of child outputs).  in_types routes each arg by
    'l'ink, 'q', or q'd' index ranges.  Parity: reference scan.py:53-134.
    """
    if len(args) != len(in_types):
        raise ValueError("len(args) must match len(in_types)")

    levels = _level_plan(sys)
    y, ys = None, []

    if reverse:
        for depth in range(len(levels) - 1, -1, -1):
            in_args = [_take(a, levels[depth][t]) for a, t in zip(args, in_types)]
            if y is not None:
                link_idxs = levels[depth]["l"]
                parent_idxs = [sys.link_parents[i] for i in levels[depth + 1]["l"]]
                parent_map = jnp.array([link_idxs.index(p) for p in parent_idxs])
                n = len(link_idxs)
                y = jax.tree_util.tree_map(
                    lambda x: jnp.zeros((n,) + x.shape[1:]).at[parent_map].add(x), y
                )
            y = f(y, *in_args)
            ys.insert(0, y)
    else:
        for depth in range(len(levels)):
            in_args = [_take(a, levels[depth][t]) for a, t in zip(args, in_types)]
            if y is not None:
                parent_idxs = [sys.link_parents[i] for i in levels[depth]["l"]]
                parent_map = [levels[depth - 1]["l"].index(p) for p in parent_idxs]
                y = _take(y, parent_map)
            y = f(y, *in_args)
            ys.append(y)

    y = jax.tree_util.tree_map(lambda *x: jnp.concatenate(x), *ys)
    order = sum([lvl["l"] for lvl in levels], [])
    return _reorder(y, order)


def _type_plan(sys: System):
    typ_order = sorted(set(sys.link_types), key=sys.link_types.find)
    groups = [{"l": [], "q": [], "d": []} for _ in typ_order]
    q_idx, qd_idx = 0, 0
    for i, t in enumerate(sys.link_types):
        g = groups[typ_order.index(t)]
        g["l"].append(i)
        g["q"].extend(range(q_idx, q_idx + Q_WIDTHS[t]))
        g["d"].extend(range(qd_idx, qd_idx + QD_WIDTHS[t]))
        q_idx += Q_WIDTHS[t]
        qd_idx += QD_WIDTHS[t]
    return typ_order, groups


def link_types(
    sys: System, f: Callable[..., Y], in_types: str, out_types: str, *args
) -> Y:
    """Calls f once per distinct link type over that type's index ranges.

    Outputs are concatenated and re-ordered back to system link order.
    Parity: reference scan.py:137-193.
    """
    typ_order, groups = _type_plan(sys)

    ys = []
    for typ, g in zip(typ_order, groups):
        in_args = [_take(a, g[t]) for a, t in zip(args, in_types)]
        ys.append(f(typ, *in_args))

    y = jax.tree_util.tree_map(lambda *x: jnp.concatenate(x), *ys)

    ys = [y] if len(out_types) == 1 else y
    out_ys = []
    for i, ot in enumerate(out_types):
        order = sum([g[ot] for g in groups], [])
        out_ys.append(_reorder(ys[i], order))
    return out_ys[0] if len(out_types) == 1 else out_ys


def actuator_types(
    sys: System, f: Callable[..., Y], in_types: str, out_type: str, *args
) -> Y:
    """Calls f once per distinct actuator type (reference scan.py:196-246)."""
    typ_order = sorted(set(sys.actuator_types), key=sys.actuator_types.find)
    groups = [{"a": [], "l": [], "q": [], "d": []} for _ in typ_order]
    for i, t in enumerate(sys.actuator_types):
        g = groups[typ_order.index(t)]
        g["a"].append(i)
        g["l"].append(sys.actuator_link_id[i])
        g["q"].append(sys.actuator_qid[i])
        g["d"].append(sys.actuator_qdid[i])

    ys = []
    for typ, g in zip(typ_order, groups):
        in_args = [_take(a, g[t]) for a, t in zip(args, in_types)]
        ys.append(f(typ, *in_args))

    y = jax.tree_util.tree_map(lambda *x: jnp.concatenate(x), *ys)
    order = sum([g[out_type] for g in groups], [])
    return _reorder(y, order)
