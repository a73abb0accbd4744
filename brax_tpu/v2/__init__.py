"""Generalized-coordinate physics engine (reference brax/v2 parity).

Three pipelines over one traceable `System` description:

- ``generalized``: MuJoCo-fidelity dynamics in joint space (CRB mass matrix,
  RNE bias forces, NNLS contact solver) — reference brax/v2/generalized.
- ``spring``: maximal-coordinate spring/damper joints — reference
  brax/v2/spring.
- ``positional``: position-based dynamics on v2 types (the reference's
  positional pipeline is an unimplemented stub, v2/positional/pipeline.py:39-43;
  here it is real).

Scenes load from MJCF XML via :mod:`brax_tpu.v2.mjcf` — a native parser with
MuJoCo compile semantics (no `mujoco` dependency; reference v2/io/mjcf.py:293
delegates to the mujoco bindings instead).

TPU-first design notes: all spatial algebra broadcasts over leading axes (no
per-row vmap chains), kinematic-tree scans unroll at trace time from a static
`TreePlan`, and the constraint solver is a fixed-iteration FISTA written in
pure jnp (`lax.scan`), so the entire pipeline step is one fusable XLA program
that supports `jit`/`vmap`/`grad`.
"""

from brax_tpu.v2 import base
from brax_tpu.v2.base import (
    Actuator,
    Box,
    Capsule,
    Contact,
    Convex,
    DoF,
    Force,
    Geometry,
    Inertia,
    Link,
    Mesh,
    Motion,
    Plane,
    Sphere,
    State,
    System,
    Transform,
)
