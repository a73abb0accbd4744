"""Spatial-algebra primitives and the generalized-coordinate System.

Functional parity with reference brax/v2/base.py (Transform/Motion/Force/
Inertia six-vector algebra, Link/DoF/Geometry/Contact/Actuator/State/System),
re-designed batch-first: every operation broadcasts over arbitrary leading
axes, so code that the reference writes as `x.vmap().do(y)` chains is here a
single broadcasting call — one fewer tracing layer and the same XLA.

Link types ('f' free, '1' revolute, '2' universal, '3' spherical) size the
generalized position/velocity vectors exactly as the reference
(v2/base.py:26-27).
"""

from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import struct
from jax.tree_util import tree_map

from brax_tpu import maths

Array = jax.Array

Q_WIDTHS = {"f": 7, "1": 1, "2": 2, "3": 3}
QD_WIDTHS = {"f": 6, "1": 1, "2": 2, "3": 3}


class _Base:
    """Pytree arithmetic shared by all spatial types (reference v2/base.py:30-108)."""

    def __add__(self, o: Any) -> Any:
        return tree_map(lambda x, y: x + y, self, o)

    def __sub__(self, o: Any) -> Any:
        return tree_map(lambda x, y: x - y, self, o)

    def __mul__(self, o: Any) -> Any:
        return tree_map(lambda x: x * o, self)

    def __neg__(self) -> Any:
        return tree_map(lambda x: -x, self)

    def __truediv__(self, o: Any) -> Any:
        return tree_map(lambda x: x / o, self)

    def reshape(self, shape: Sequence[int]) -> Any:
        return tree_map(lambda x: x.reshape(shape), self)

    def select(self, o: Any, cond: Array) -> Any:
        return tree_map(lambda x, y: (x.T * cond + y.T * (1 - cond)).T, self, o)

    def slice(self, beg: int, end: int) -> Any:
        return tree_map(lambda x: x[beg:end], self)

    def take(self, i, axis: int = 0) -> Any:
        return tree_map(lambda x: jnp.take(x, i, axis=axis, mode="wrap"), self)

    def concatenate(self, *others: Any, axis: int = 0) -> Any:
        return tree_map(lambda *x: jnp.concatenate(x, axis=axis), self, *others)

    def index_set(self, idx, o: Any) -> Any:
        return tree_map(lambda x, y: x.at[idx].set(y), self, o)

    def index_sum(self, idx, o: Any) -> Any:
        return tree_map(lambda x, y: x.at[idx].add(y), self, o)

    @property
    def T(self):  # noqa: N802 - reference-parity name
        return tree_map(lambda x: x.T, self)


@struct.dataclass
class Transform(_Base):
    """Position + quaternion rotation of a coordinate frame.

    pos: (..., 3); rot: (..., 4) wxyz.  Parity: v2/base.py:111-155.
    """

    pos: Array
    rot: Array

    def do(self, o: Any) -> Any:
        """Applies this transform to o (Transform, Motion, Force, or Inertia).

        Broadcasts: batched self against batched o directly — the reference's
        `x.vmap().do(y)` is just `x.do(y)` here.
        """
        if isinstance(o, Transform):
            return Transform(
                pos=self.pos + maths.rotate(o.pos, self.rot),
                rot=maths.quat_mul(self.rot, o.rot),
            )
        if isinstance(o, Motion):
            inv = maths.quat_inv(self.rot)
            return Motion(
                ang=maths.rotate(o.ang, inv),
                vel=maths.rotate(o.vel - jnp.cross(self.pos, o.ang), inv),
            )
        if isinstance(o, Force):
            return Force(
                vel=maths.rotate(o.vel, self.rot),
                ang=maths.rotate(o.ang, self.rot)
                + jnp.cross(self.pos, maths.rotate(o.vel, self.rot)),
            )
        if isinstance(o, Inertia):
            # h[..., k, :] = cross(pos, -e_k); i' = R i Rt + h ht m
            eye = jnp.eye(3)
            h = jnp.cross(self.pos[..., None, :], -eye)
            rot = maths.quat_to_3x3(self.rot)
            i = (
                rot @ o.i @ jnp.swapaxes(rot, -1, -2)
                + h @ jnp.swapaxes(h, -1, -2) * o.mass[..., None, None]
            )
            transform = Transform(pos=self.pos * o.mass[..., None], rot=self.rot)
            return Inertia(transform=transform, i=i, mass=o.mass)
        raise TypeError(f"cannot transform {type(o)}")

    def to_local(self, t: "Transform") -> "Transform":
        """Moves this transform into the basis of t (v2/base.py:127-131)."""
        return Transform(
            pos=maths.rotate(self.pos - t.pos, maths.quat_inv(t.rot)),
            rot=maths.quat_mul(maths.quat_inv(t.rot), self.rot),
        )

    def inv(self) -> "Transform":
        return Transform(pos=-1.0 * self.pos, rot=maths.quat_inv(self.rot))

    @classmethod
    def create(cls, pos: Optional[Array] = None, rot: Optional[Array] = None):
        if pos is None and rot is None:
            raise ValueError("must specify either pos or rot")
        if pos is None:
            pos = jnp.zeros(rot.shape[:-1] + (3,))
        if rot is None:
            rot = jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), pos.shape[:-1] + (1,))
        return Transform(pos=pos, rot=rot)

    @classmethod
    def zero(cls, shape=()) -> "Transform":
        return Transform(
            pos=jnp.zeros(shape + (3,)),
            rot=jnp.tile(jnp.array([1.0, 0.0, 0.0, 0.0]), shape + (1,)),
        )


@struct.dataclass
class Motion(_Base):
    """Spatial motion vector: angular + linear velocity (v2/base.py:158-196)."""

    ang: Array
    vel: Array

    def cross(self, other: Union["Motion", "Force"]):
        """Spatial cross product (v2/base.py:591-608; self x other)."""
        if isinstance(other, Force):
            return Force(
                ang=jnp.cross(self.ang, other.ang) + jnp.cross(self.vel, other.vel),
                vel=jnp.cross(self.ang, other.vel),
            )
        return Motion(
            ang=jnp.cross(self.ang, other.ang),
            vel=jnp.cross(self.ang, other.vel) + jnp.cross(self.vel, other.ang),
        )

    def dot(self, m: Union["Motion", "Force"]) -> Array:
        return maths.vdot(self.vel, m.vel) + maths.vdot(self.ang, m.ang)

    def matrix(self) -> Array:
        return jnp.concatenate([self.ang, self.vel], axis=-1)

    @classmethod
    def create(cls, ang: Optional[Array] = None, vel: Optional[Array] = None):
        if ang is None and vel is None:
            raise ValueError("must specify either ang or vel")
        ang = jnp.zeros_like(vel) if ang is None else ang
        vel = jnp.zeros_like(ang) if vel is None else vel
        return Motion(ang=ang, vel=vel)

    @classmethod
    def zero(cls, shape=()) -> "Motion":
        return Motion(ang=jnp.zeros(shape + (3,)), vel=jnp.zeros(shape + (3,)))


@struct.dataclass
class Force(_Base):
    """Spatial force vector: torque + linear force (v2/base.py:199-209)."""

    ang: Array
    vel: Array


@struct.dataclass
class Inertia(_Base):
    """Spatial inertia: CoM transform, rotational inertia, mass (v2/base.py:212-232)."""

    transform: Transform
    i: Array
    mass: Array

    def mul(self, m: Motion) -> Force:
        """Inertia times motion = force; batched matmul over the MXU."""
        ang = jnp.einsum("...ij,...j->...i", self.i, m.ang) + jnp.cross(
            self.transform.pos, m.vel
        )
        vel = self.mass[..., None] * m.vel - jnp.cross(self.transform.pos, m.ang)
        return Force(ang=ang, vel=vel)


@struct.dataclass
class Link(_Base):
    """A rigid segment of an articulated body (v2/base.py:236-262)."""

    transform: Transform
    joint: Transform
    inertia: Inertia
    invweight: Array
    # spring pipeline only:
    constraint_stiffness: Array
    constraint_damping: Array
    constraint_limit_stiffness: Array
    # spring + positional pipelines:
    constraint_ang_damping: Array


@struct.dataclass
class DoF(_Base):
    """A degree of freedom (v2/base.py:265-284)."""

    motion: Motion
    armature: Array
    stiffness: Array
    damping: Array
    limit: Optional[Tuple[Array, Array]]
    # generalized pipeline only:
    invweight: Array


@struct.dataclass
class Geometry(_Base):
    """A collidable shape attached to a link (v2/base.py:287-302)."""

    link_idx: Optional[Array]
    transform: Transform
    friction: Array
    elasticity: Array


@struct.dataclass
class Sphere(Geometry):
    radius: Array


@struct.dataclass
class Capsule(Geometry):
    radius: Array
    length: Array


@struct.dataclass
class Box(Geometry):
    halfsize: Array


@struct.dataclass
class Plane(Geometry):
    """Infinite plane with +z normal in its own frame."""


@struct.dataclass
class Mesh(Geometry):
    vert: Array
    face: Array


@struct.dataclass
class Convex(Mesh):
    unique_edge: Array


@struct.dataclass
class Contact(_Base):
    """Contact between two geometries (v2/base.py:372-393)."""

    pos: Array
    normal: Array
    penetration: Array
    friction: Array
    # spring + positional pipelines:
    elasticity: Array
    link_idx: Tuple[Array, Optional[Array]]


@struct.dataclass
class Actuator(_Base):
    """Actuator parameters (v2/base.py:396-407)."""

    ctrl_range: Array
    gear: Array


@struct.dataclass
class State:
    """Dynamic pipeline state (v2/base.py:410-426)."""

    q: Array
    qd: Array
    x: Transform
    xd: Motion
    contact: Optional[Contact]


@struct.dataclass
class System:
    """A physical scene: links, joints, geometries (v2/base.py:429-545).

    Traced leaves (dt, gravity, link, dof, geoms, actuator, init_q...) support
    domain randomization by vmapping env construction over System pytrees;
    static fields (names, types, parents) shape the emitted program.
    """

    dt: Array
    gravity: Array
    link: Link
    dof: DoF
    geoms: List[Geometry]
    contacts: List[Tuple[Geometry, Geometry]]
    actuator: Actuator
    init_q: Array
    # spring + positional pipelines:
    vel_damping: Array
    ang_damping: Array
    baumgarte_erp: Array

    link_names: Tuple[str, ...] = struct.field(pytree_node=False)
    link_types: str = struct.field(pytree_node=False)
    link_parents: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_types: str = struct.field(pytree_node=False)
    actuator_link_id: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_qid: Tuple[int, ...] = struct.field(pytree_node=False)
    actuator_qdid: Tuple[int, ...] = struct.field(pytree_node=False)
    # generalized pipeline only:
    solver_iterations: int = struct.field(pytree_node=False)

    def num_links(self) -> int:
        return len(self.link_types)

    def dof_link(self, depth: bool = False):
        """Link index for each dof; with depth, the within-level index."""
        link_idxs = []
        for i, link_type in enumerate(self.link_types):
            link_idxs.extend([i] * QD_WIDTHS[link_type])
        if depth:
            depth_count: dict = {}
            link_idx_depth = []
            for i in range(self.num_links()):
                d = self._depth(i)
                depth_idx = depth_count.get(d, 0)
                depth_count[d] = depth_idx + 1
                link_idx_depth.append(depth_idx)
            link_idxs = [link_idx_depth[i] for i in link_idxs]
        return jnp.array(link_idxs)

    def _depth(self, i: int) -> int:
        d = 0
        while self.link_parents[i] != -1:
            i = self.link_parents[i]
            d += 1
        return d

    def dof_ranges(self) -> List[List[int]]:
        beg, ranges = 0, []
        for t in self.link_types:
            ranges.append(list(range(beg, beg + QD_WIDTHS[t])))
            beg += QD_WIDTHS[t]
        return ranges

    def q_idx(self, link_type: str) -> Array:
        idx, idxs = 0, []
        for typ in self.link_types:
            if typ in link_type:
                idxs.extend(range(idx, idx + Q_WIDTHS[typ]))
            idx += Q_WIDTHS[typ]
        return jnp.array(idxs, dtype=jnp.int32)

    def qd_idx(self, link_type: str) -> Array:
        idx, idxs = 0, []
        for typ in self.link_types:
            if typ in link_type:
                idxs.extend(range(idx, idx + QD_WIDTHS[typ]))
            idx += QD_WIDTHS[typ]
        return jnp.array(idxs, dtype=jnp.int32)

    def q_size(self) -> int:
        return sum(Q_WIDTHS[t] for t in self.link_types)

    def qd_size(self) -> int:
        return sum(QD_WIDTHS[t] for t in self.link_types)

    def act_size(self) -> int:
        """One control per actuator.

        Deliberate divergence from reference v2/base.py:543-545, which sums
        QD_WIDTHS over actuated links — equivalent for 1-dof links (all the
        reference's v2 envs) but overcounts when a hinge inside a 2/3-dof
        stack is actuated (e.g. humanoid hips): to_tau routes exactly one
        scalar per actuator via actuator_qdid.
        """
        return len(self.actuator_types)
