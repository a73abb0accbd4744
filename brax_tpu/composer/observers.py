"""Per-component observation builders.

Named observers produce (name, vector) entries per component; the env
concatenates them in deterministic order.  Role parity:
/root/reference/brax/experimental/composer/observers.py (the reference's
SimObserver machinery collapses to plain functions over our dense System).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp

from brax_tpu.sim.types import QP, Info


def component_obs(env, comp: dict, qp: QP, info: Info) -> List[Tuple[str, jnp.ndarray]]:
    """Returns ordered (name, vec) observation entries for one component."""
    out = []
    name = comp["name"]
    body_idx = comp["body_idx"]  # list of global body indices
    root = comp["root_idx"]
    for obs_name in comp["observers"]:
        if obs_name == "root_z_joints":
            angles, vels = _component_joints(env, comp, qp)
            out.append((f"{name}_root_z", qp.pos[root, 2:]))
            out.append((f"{name}_root_rot", qp.rot[root]))
            out.append((f"{name}_root_vel", qp.vel[root]))
            out.append((f"{name}_root_ang", qp.ang[root]))
            out.append((f"{name}_joint_angles", angles))
            out.append((f"{name}_joint_vels", vels))
        elif obs_name == "cfrc":
            idx = jnp.array(body_idx)
            cfrc = jnp.concatenate(
                [
                    jnp.clip(info.contact.vel[idx], -1, 1).reshape(-1),
                    jnp.clip(info.contact.ang[idx], -1, 1).reshape(-1),
                ]
            )
            out.append((f"{name}_cfrc", cfrc))
        elif obs_name == "qp":
            idx = jnp.array(body_idx)
            out.append((f"{name}_qp_pos", qp.pos[idx].reshape(-1)))
            out.append((f"{name}_qp_rot", qp.rot[idx].reshape(-1)))
            out.append((f"{name}_qp_vel", qp.vel[idx].reshape(-1)))
            out.append((f"{name}_qp_ang", qp.ang[idx].reshape(-1)))
        else:
            raise ValueError(f"unknown observer {obs_name!r}")
    return out


def edge_obs(env, comp_a: dict, comp_b: dict, desc: dict, qp: QP):
    """Edge observer entry (ref ma_descs extra_observers: root_vec)."""
    kind = desc.get("observer_type", "root_vec")
    if kind == "root_vec":
        idx = jnp.asarray(desc.get("indices", (0, 1)), jnp.int32)
        vec = (qp.pos[comp_a["root_idx"]] - qp.pos[comp_b["root_idx"]])[idx]
        return (f"{comp_a['name']}__{comp_b['name']}_root_vec", vec)
    raise ValueError(f"unknown edge observer {kind!r}")


def _component_joints(env, comp: dict, qp: QP):
    """Joint angles/velocities restricted to this component's joints."""
    angles, vels = env.sys.joint_angle_vel(qp)
    sel = jnp.array(comp["joint_dof_idx"], dtype=jnp.int32)
    if sel.shape[0] == 0:
        return jnp.zeros((0,)), jnp.zeros((0,))
    return angles[sel], vels[sel]
