"""Scene composition: build one physics system from component descriptions.

    env = create(
        components=dict(
            agent1=dict(component='ant', pos=(0, 1, 0)),
            agent2=dict(component='ant', pos=(0, -1, 0)),
        ),
        edges={'agent1__agent2': dict(collide_type='root',
                                      reward_fns=dict(chase=dict(reward_type='chase')))},
        agent_groups=dict(agent1=dict(reward_names=('chase__agent1__agent2',)),
                          agent2=dict(reward_names=('chase__agent1__agent2',))),
    )

Behavior parity: /root/reference/brax/experimental/composer/composer.py
(Composer 108-263, ComponentEnv 263-423).  The reference edits protobuf text
messages; here components are plain dataclass configs, so composition is
direct data manipulation.
"""

from __future__ import annotations

import copy
import itertools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from brax_tpu import maths
from brax_tpu.envs import base
from brax_tpu.composer import components as components_lib
from brax_tpu.composer import observers as observers_lib
from brax_tpu.composer import reward_functions as rewards_lib
from brax_tpu.sim import config as cfg


def _ns(comp_name: str, name: str) -> str:
    return f"{comp_name}/{name}"


class Composer:
    """Merges namespaced component configs into one scene Config."""

    def __init__(
        self,
        components: Dict[str, Dict[str, Any]],
        edges: Optional[Dict[str, Dict[str, Any]]] = None,
        add_ground: bool = True,
        agent_groups: Optional[Dict[str, Any]] = None,
        global_options: Optional[Dict[str, Any]] = None,
    ):
        components = copy.deepcopy(components)
        edges = copy.deepcopy(edges or {})
        global_options = dict(global_options or {})
        if add_ground:
            components["ground"] = dict(component="ground")

        self.agent_groups = agent_groups or {}

        # --- load + namespace components ---
        self.components: Dict[str, dict] = {}
        merged = cfg.Config(bodies=[], joints=[], actuators=[], forces=[])
        reward_descs = []  # (name, kind, factory_kwargs, comp names)

        for name in sorted(components):
            desc = dict(components[name])
            spec = components_lib.load_component(
                desc.pop("component"),
                **desc.pop("component_params", {}),
            )
            comp_cfg = copy.deepcopy(spec.config)
            rename = {}
            for b in comp_cfg.bodies:
                rename[b.name] = _ns(name, b.name)
                b.name = rename[b.name]
            for j in comp_cfg.joints:
                j.name = _ns(name, j.name)
                j.parent = rename[j.parent]
                j.child = rename[j.child]
            for a in comp_cfg.actuators:
                a.name = _ns(name, a.name)
                a.joint = _ns(name, a.joint)
            for fo in comp_cfg.forces:
                fo.name = _ns(name, fo.name)
                fo.body = rename[fo.body]
            comp_cfg.collide_include = [
                (rename[a], rename[b]) for a, b in comp_cfg.collide_include
            ]

            merged.bodies += comp_cfg.bodies
            merged.joints += comp_cfg.joints
            merged.actuators += comp_cfg.actuators
            merged.forces += comp_cfg.forces
            merged.collide_include += comp_cfg.collide_include
            for d in comp_cfg.defaults:
                for ang in d.angles:
                    ang.name = _ns(name, ang.name)
                for qps in d.qps:
                    qps.name = _ns(name, qps.name)
                if len(merged.defaults) == 0:
                    merged.defaults.append(cfg.Defaults())
                merged.defaults[0].angles += d.angles
                merged.defaults[0].qps += d.qps

            # term_params (e.g. z_offset for agents standing on objects,
            # ref sa_descs.py ant_on_ball): shift the frame the component's
            # termination bounds are evaluated in
            term_fn = spec.term_fn
            term_params = desc.pop("term_params", None)
            if term_params and term_fn is not None:
                z_off = float(term_params.get("z_offset", 0.0))

                def term_fn(done, qp, root_idx, _f=spec.term_fn, _z=z_off):
                    shifted = qp.replace(
                        pos=qp.pos - jnp.array([0.0, 0.0, _z])
                    )
                    return _f(done, shifted, root_idx)

            comp = dict(
                name=name,
                root=_ns(name, spec.root),
                collides=[rename[c] for c in spec.collides],
                bodies=[b.name for b in comp_cfg.bodies],
                joints=[j.name for j in comp_cfg.joints],
                actuators=[a.name for a in comp_cfg.actuators],
                forces=[fo.name for fo in comp_cfg.forces],
                term_fn=term_fn,
                observers=list(desc.pop("observers", spec.observers)),
                pos=jnp.asarray(desc.pop("pos", (0.0, 0.0, 0.0)), jnp.float32),
                quat=jnp.asarray(desc.pop("quat", (1.0, 0.0, 0.0, 0.0)), jnp.float32),
                quat_origin=jnp.asarray(
                    desc.pop("quat_origin", (0.0, 0.0, 0.0)), jnp.float32
                ),
                frozen=desc.pop("frozen", False),
                # source config for dt defaults
                dt=comp_cfg.dt,
                substeps=comp_cfg.substeps,
                friction=comp_cfg.friction,
                elasticity=comp_cfg.elasticity,
                gravity=comp_cfg.gravity,
                angular_damping=comp_cfg.angular_damping,
                baumgarte_erp=comp_cfg.baumgarte_erp,
            )
            comp["collide"] = desc.pop("collide", True)
            if comp["frozen"]:
                for b in comp_cfg.bodies:
                    b.frozen = cfg.FrozenAxes(all=True)
            for rname, rkwargs in sorted(desc.pop("reward_fns", {}).items()):
                reward_descs.append((f"{rname}__{name}", "component", rkwargs, (name,)))
            assert not desc, f"unused component kwargs: {desc}"
            self.components[name] = comp

        # --- edges ---
        self.edge_observers = []  # (k1, k2, observer desc)
        for k1, k2 in itertools.combinations(sorted(self.components), 2):
            edge_name = f"{k1}__{k2}"
            v = edges.pop(edge_name, {})
            c1, c2 = self.components[k1], self.components[k2]
            collide_type = v.pop("collide_type", "full")
            if not (c1["collide"] and c2["collide"]):
                pass  # a collide=False endpoint suppresses the pair entirely
            elif collide_type == "full":
                merged.collide_include += [
                    (a, b) for a in c1["collides"] for b in c2["collides"]
                ]
            elif collide_type == "root":
                merged.collide_include += [(c1["root"], c2["root"])]
            elif collide_type:
                raise ValueError(f"unknown collide_type {collide_type}")
            for rname, rkwargs in sorted(v.pop("reward_fns", {}).items()):
                reward_descs.append(
                    (f"{rname}__{edge_name}", "edge", rkwargs, (k1, k2))
                )
            for obs_desc in v.pop("extra_observers", []):
                self.edge_observers.append((k1, k2, dict(obs_desc)))
            assert not v, f"unused edge kwargs: {v}"
        assert not edges, f"unknown edges: {sorted(edges)}"

        # --- global scene params ---
        ref = next(
            (c for c in self.components.values() if c["name"] != "ground"),
            next(iter(self.components.values())),
        )
        merged.dt = global_options.get("dt", ref["dt"])
        merged.substeps = global_options.get("substeps", ref["substeps"])
        merged.friction = global_options.get("friction", ref["friction"])
        merged.elasticity = global_options.get("elasticity", ref["elasticity"])
        merged.gravity = tuple(global_options.get("gravity", ref["gravity"]))
        merged.angular_damping = global_options.get(
            "angular_damping", ref["angular_damping"]
        )
        merged.baumgarte_erp = global_options.get(
            "baumgarte_erp", ref["baumgarte_erp"]
        )
        # '' lets validate() infer from joint stiffness: pure-PBD components
        # compose to pbd, spring components (octopus) to legacy_spring
        merged.dynamics_mode = global_options.get("dynamics_mode", "")

        self.config = merged
        self.reward_descs = reward_descs


class ComponentEnv(base.Env):
    """An Env over a composed scene: modular obs, rewards, termination."""

    def __init__(self, composer: Composer):
        super().__init__(config=composer.config)
        self.composer = composer

        # resolve per-component indices against the built system
        body_index = self.art.body_index
        joint_names = [j.name for j in self.art.config.joints]
        dof_offsets = {}
        off = 0
        for j in self.art.config.joints:
            dof_offsets[j.name] = list(range(off, off + len(j.angle_limits)))
            off += len(j.angle_limits)
        act_offsets = {}
        off = 0
        for a in self.art.config.actuators:
            dofs = len(
                next(j for j in self.art.config.joints if j.name == a.joint).angle_limits
            )
            act_offsets[a.name] = list(range(off, off + dofs))
            off += dofs
        # force action dims follow all actuator dofs, 3 per force
        # (sim/builder.py::_build_forces)
        force_offsets = {}
        for fo in self.art.config.forces:
            force_offsets[fo.name] = list(range(off, off + 3))
            off += 3

        self.component_meta = {}
        for name, comp in composer.components.items():
            meta = dict(comp)
            meta["body_idx"] = [body_index[b] for b in comp["bodies"]]
            meta["root_idx"] = body_index[comp["root"]]
            meta["joint_dof_idx"] = [
                i for j in comp["joints"] for i in dof_offsets[j]
            ]
            meta["act_idx"] = [
                i for a in comp["actuators"] for i in act_offsets[a]
            ] + [i for f in comp["forces"] for i in force_offsets[f]]
            self.component_meta[name] = meta

        # instantiate reward fns; track which components each touches (for
        # reward_agents group expansion, parity: agent_utils.set_names_info)
        self.reward_fns = {}
        self._reward_comps = {}
        for rname, kind, rkwargs, comps in composer.reward_descs:
            rkwargs = dict(rkwargs)
            rtype = rkwargs.pop("reward_type")
            if kind == "component":
                fn = rewards_lib.COMPONENT_REWARDS[rtype](
                    self.component_meta[comps[0]], **rkwargs
                )
            else:
                fn = rewards_lib.EDGE_REWARDS[rtype](
                    self.component_meta[comps[0]],
                    self.component_meta[comps[1]],
                    **rkwargs,
                )
            self.reward_fns[rname] = fn
            self._reward_comps[rname] = tuple(comps)

        # multi-agent grouping: per-agent action slices + reward names.
        # reward_agents=('a',) expands to every reward touching component 'a'
        self.agent_groups = composer.agent_groups
        self.group_action_shapes = {}
        for agent, spec in sorted(self.agent_groups.items()):
            comps = spec.get("action_agents", (agent,))
            idx = [i for c in comps for i in self.component_meta[c]["act_idx"]]
            names = tuple(spec.get("reward_names", ()))
            for ragent in spec.get("reward_agents", ()):
                # exact component-set match (ref component_editor.match_name:
                # 'a1' matches a1's own rewards, ('a1','a2') matches the edge)
                rset = (ragent,) if isinstance(ragent, str) else tuple(sorted(ragent))
                names += tuple(
                    rn for rn, rcomps in self._reward_comps.items()
                    if tuple(sorted(rcomps)) == rset
                )
            names = tuple(dict.fromkeys(names))
            self.group_action_shapes[agent] = dict(
                indices=idx, size=len(idx), reward_names=names,
            )

    @property
    def is_multiagent(self) -> bool:
        return bool(self.agent_groups)

    @property
    def agent_names(self):
        return tuple(sorted(self.agent_groups))

    def reset(self, rng) -> base.State:
        qpos = self.default_angle()
        qp = self.default_qp(joint_angle=qpos)
        qp = self._transform_qp(qp)
        info = self.sys.info(qp)
        obs = self._get_obs(qp, info)
        shape = (len(self.agent_groups),) if self.agent_groups else ()
        reward = jnp.zeros(shape)
        done = jnp.zeros(())
        metrics = {f"reward_{k}": jnp.zeros(()) for k in self.reward_fns}
        metrics["distance"] = jnp.zeros(())
        return base.State(qp, obs, reward, done, metrics)

    def step(self, state: base.State, action) -> base.State:
        qp, info = self.sys.step(state.qp, action)
        obs = self._get_obs(qp, info)

        rewards, dones = {}, {}
        for name, fn in self.reward_fns.items():
            rewards[name], dones[name] = fn(self, qp, state.qp, action)
        if self.agent_groups:
            per_agent = []
            for agent in self.agent_names:
                names = self.group_action_shapes[agent]["reward_names"]
                vals = [rewards[n] for n in names] or [jnp.zeros(())]
                per_agent.append(sum(vals))
            reward = jnp.stack(per_agent)
        else:
            reward = sum(rewards.values()) if rewards else jnp.zeros(())

        # termination: any component term_fn or any reward-voted done
        # (caught prey / out of the ring, ref agent_utils.process_agent_rewards)
        done = jnp.zeros(())
        for name, meta in self.component_meta.items():
            if meta["term_fn"] is not None:
                done = meta["term_fn"](done, qp, meta["root_idx"])
        for d in dones.values():
            done = jnp.maximum(done, d)

        state.metrics.update({f"reward_{k}": v for k, v in rewards.items()})
        return state.replace(qp=qp, obs=obs, reward=reward, done=done)

    def _transform_qp(self, qp):
        """Applies each component's pos/quat placement (sim_utils.transform_qp)."""
        import numpy as onp

        pos, rot = qp.pos, qp.rot
        for name, meta in self.component_meta.items():
            # static skip: decided from concrete numpy values at build time
            if (
                onp.abs(onp.asarray(meta["pos"])).sum() == 0.0
                and float(onp.asarray(meta["quat"])[0]) == 1.0
            ):
                continue
            idx = jnp.array(meta["body_idx"])
            p = pos[idx]
            p = maths.rotate(p - meta["quat_origin"], meta["quat"]) + meta["quat_origin"]
            p = p + meta["pos"]
            r = maths.quat_mul(meta["quat"], rot[idx])
            pos = pos.at[idx].set(p)
            rot = rot.at[idx].set(r)
        return qp.replace(pos=pos, rot=rot)

    def _get_obs(self, qp, info):
        entries = []
        for name in sorted(self.component_meta):
            entries += observers_lib.component_obs(
                self, self.component_meta[name], qp, info
            )
        for k1, k2, desc in self.composer.edge_observers:
            entries.append(
                observers_lib.edge_obs(
                    self, self.component_meta[k1], self.component_meta[k2],
                    desc, qp,
                )
            )
        self.observer_shapes = {k: v.shape for k, v in entries}
        return jnp.concatenate([v for _, v in entries]) if entries else jnp.zeros((0,))


def create(
    components: Dict[str, Dict[str, Any]],
    edges: Optional[Dict[str, Dict[str, Any]]] = None,
    add_ground: bool = True,
    agent_groups: Optional[Dict[str, Any]] = None,
    global_options: Optional[Dict[str, Any]] = None,
    episode_length: Optional[int] = 1000,
    action_repeat: int = 1,
    batch_size: Optional[int] = None,
    auto_reset: bool = True,
) -> base.Env:
    """Builds a composed environment with the standard wrapper stack."""
    from brax_tpu.envs import wrappers

    env = ComponentEnv(
        Composer(
            components,
            edges=edges,
            add_ground=add_ground,
            agent_groups=agent_groups,
            global_options=global_options,
        )
    )
    if episode_length is not None:
        env = wrappers.EpisodeWrapper(env, episode_length, action_repeat)
    if batch_size:
        env = wrappers.VmapWrapper(env, batch_size)
    if auto_reset:
        env = wrappers.AutoResetWrapper(env)
    return env
