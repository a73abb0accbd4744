"""Component registry for scene composition.

Each component provides a scene-config factory (bodies/joints/actuators
without a ground plane), a root body, the set of collidable bodies, a
termination function, and default observers.  Role parity:
/root/reference/brax/experimental/composer/components/.
"""

from __future__ import annotations

import copy
import dataclasses
from typing import Callable, Dict, Optional, Sequence

import jax.numpy as jnp

from brax_tpu.sim import config as cfg


@dataclasses.dataclass
class ComponentSpecs:
    config: cfg.Config  # bodies/joints/actuators only (no ground, no dt)
    root: str
    collides: Sequence[str]
    term_fn: Optional[Callable] = None
    observers: Sequence[str] = ("root_z_joints",)


_COMPONENTS: Dict[str, Callable[..., ComponentSpecs]] = {}


def register_component(name: str, fn: Callable[..., ComponentSpecs]):
    _COMPONENTS[name] = fn


def load_component(component: str, **kwargs) -> ComponentSpecs:
    return _COMPONENTS[component](**kwargs)


def list_components():
    return sorted(_COMPONENTS)


# --- termination helpers (reference components/common.py) -------------------


def height_term_fn(done, qp, body_idx, min_height=0.2, max_height=1.0):
    z = qp.pos[body_idx, 2]
    done = jnp.where(z < min_height, 1.0, done)
    done = jnp.where(z > max_height, 1.0, done)
    return done


def upright_term_fn(done, qp, body_idx):
    """Terminates when the root's +z axis points down."""
    from brax_tpu import maths

    up = maths.rotate(jnp.array([0.0, 0.0, 1.0]), qp.rot[body_idx])
    return jnp.where(up[2] < 0, 1.0, done)


# --- built-in components -----------------------------------------------------


def _strip_ground(config: cfg.Config) -> cfg.Config:
    config = copy.deepcopy(config)
    ground_names = {
        b.name for b in config.bodies
        if any(c.plane is not None for c in b.colliders)
    }
    config.bodies = [b for b in config.bodies if b.name not in ground_names]
    config.collide_include = [
        p for p in config.collide_include
        if p[0] not in ground_names and p[1] not in ground_names
    ]
    return config


def _ground() -> ComponentSpecs:
    body = cfg.Body(
        name="Ground",
        colliders=[cfg.Collider(plane=cfg.Plane())],
        inertia=(1.0, 1.0, 1.0),
        mass=1.0,
        frozen=cfg.FrozenAxes(all=True),
    )
    return ComponentSpecs(
        config=cfg.Config(bodies=[body], dt=0.05, substeps=10),
        root="Ground",
        collides=("Ground",),
        term_fn=None,
        observers=(),
    )


def _ant() -> ComponentSpecs:
    from brax_tpu.envs.assets.ant import ant_config

    config = _strip_ground(ant_config())

    def term_fn(done, qp, root_idx):
        done = height_term_fn(done, qp, root_idx, min_height=0.2, max_height=1.0)
        return upright_term_fn(done, qp, root_idx)

    return ComponentSpecs(
        config=config,
        root="$ Torso",
        collides=("$ Torso", "$ Body 4", "$ Body 7", "$ Body 10", "$ Body 13"),
        term_fn=term_fn,
        observers=("root_z_joints", "cfrc"),
    )


def _halfcheetah() -> ComponentSpecs:
    from brax_tpu.envs.assets.half_cheetah import halfcheetah_config

    config = _strip_ground(halfcheetah_config())
    return ComponentSpecs(
        config=config,
        root="torso",
        collides=("torso", "bfoot", "ffoot"),
        term_fn=None,
        observers=("root_z_joints",),
    )


def _ball(radius: float = 0.5, mass: float = 1.0, frozen: bool = False) -> ComponentSpecs:
    body = cfg.Body(
        name="Ball",
        colliders=[cfg.Collider(capsule=cfg.Capsule(radius=radius, length=2 * radius))],
        inertia=(1.0, 1.0, 1.0),
        mass=mass,
        frozen=cfg.FrozenAxes(all=True) if frozen else cfg.FrozenAxes(),
    )
    return ComponentSpecs(
        config=cfg.Config(bodies=[body], dt=0.05, substeps=10),
        root="Ball",
        collides=("Ball",),
        term_fn=None,
        observers=("qp",),
    )


register_component("ground", _ground)
register_component("ant", _ant)
register_component("halfcheetah", _halfcheetah)
register_component("ball", _ball)
register_component("singleton", _ball)
