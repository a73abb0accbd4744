"""On-device trajectory rendering: a jitted SDF ray-marcher.

Role parity with the reference's CPU rasterizer (/root/reference/brax/io/
image.py:58-217, which wraps the `pytinyrenderer` C++ library).  TPU-native
replacement: the scene (spheres/capsules/boxes/planes from the scene config)
is signed-distance composed and sphere-traced entirely in JAX, so frames
render on the accelerator and batch over the trajectory with vmap.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as onp

from brax_tpu import maths
from brax_tpu.sim.config import Config
from brax_tpu.sim.types import QP

_COLORS = onp.array(
    [
        (79, 119, 255), (255, 111, 89), (65, 211, 162), (255, 200, 87),
        (182, 126, 232), (111, 211, 255), (255, 159, 178), (167, 209, 41),
        (242, 133, 42), (136, 153, 170),
    ],
    dtype=onp.float32,
) / 255.0


@dataclasses.dataclass
class _Prims:
    """Dense primitive tables (static shapes) for the SDF scene."""

    body: onp.ndarray  # (np,) body index
    kind: onp.ndarray  # (np,) 0 sphere, 1 capsule, 2 box, 3 plane
    params: onp.ndarray  # (np, 3) radius/halflen | halfsize
    off_pos: onp.ndarray  # (np, 3) collider offset
    off_rot: onp.ndarray  # (np, 4) collider rotation quat
    color: onp.ndarray  # (np, 3)


def _build_prims(config: Config) -> _Prims:
    body, kind, params, off_pos, off_rot, color = [], [], [], [], [], []
    for i, b in enumerate(config.bodies):
        for c in b.colliders:
            if c.hidden:
                continue
            q = onp.asarray(
                maths.euler_to_quat(jnp.array(c.rotation, dtype=jnp.float32))
            )
            if c.sphere is not None:
                kind.append(0)
                params.append((c.sphere.radius, 0, 0))
            elif c.capsule is not None:
                kind.append(1)
                half = c.capsule.length / 2 - c.capsule.radius
                params.append((c.capsule.radius, half, 0))
            elif c.box is not None:
                kind.append(2)
                params.append(tuple(c.box.halfsize))
            elif c.plane is not None or c.clipped_plane is not None:
                kind.append(3)
                params.append((0, 0, 0))
            else:  # heightmap/mesh: not ray-marched (yet); skip
                continue
            body.append(i)
            off_pos.append(tuple(c.position))
            off_rot.append(tuple(q))
            color.append(_COLORS[i % len(_COLORS)])
    return _Prims(
        body=onp.array(body, onp.int32),
        kind=onp.array(kind, onp.int32),
        params=onp.array(params, onp.float32),
        off_pos=onp.array(off_pos, onp.float32),
        off_rot=onp.array(off_rot, onp.float32),
        color=onp.array(color, onp.float32),
    )


def _scene_sdf(prims: _Prims, qp: QP, p: jnp.ndarray):
    """Signed distance + color of the nearest surface at world point p."""
    pos = qp.pos[prims.body] + maths.rotate(
        jnp.asarray(prims.off_pos), qp.rot[prims.body]
    )
    rot = maths.quat_mul(qp.rot[prims.body], jnp.asarray(prims.off_rot))
    local = maths.inv_rotate(p[None, :] - pos, rot)  # (np, 3)

    r = prims.params[:, 0]
    half = prims.params[:, 1]
    hs = jnp.asarray(prims.params)

    d_sphere = jnp.linalg.norm(local, axis=-1) - r
    # capsule along local z
    zclamp = jnp.clip(local[:, 2], -half, half)
    dcap = local - jnp.stack(
        [jnp.zeros_like(zclamp), jnp.zeros_like(zclamp), zclamp], axis=-1
    )
    d_capsule = jnp.linalg.norm(dcap, axis=-1) - r
    q = jnp.abs(local) - hs
    d_box = jnp.linalg.norm(jnp.maximum(q, 0), axis=-1) + jnp.minimum(
        jnp.max(q, axis=-1), 0.0
    )
    d_plane = local[:, 2]

    kind = jnp.asarray(prims.kind)
    d = jnp.where(
        kind == 0,
        d_sphere,
        jnp.where(kind == 1, d_capsule, jnp.where(kind == 2, d_box, d_plane)),
    )
    idx = jnp.argmin(d)
    return d[idx], idx


def _march(prims: _Prims, qp: QP, origin, direction, steps: int = 48):
    def body(carry, _):
        t, _ = carry
        d, idx = _scene_sdf(prims, qp, origin + t * direction)
        return (t + 0.9 * d, idx), ()

    (t, idx), _ = jax.lax.scan(body, (jnp.zeros(()), jnp.zeros((), jnp.int32)), (), length=steps)
    return t, idx


def _normal(prims: _Prims, qp: QP, p):
    eps = 1e-3

    def sd(q):
        return _scene_sdf(prims, qp, q)[0]

    grad = jnp.stack(
        [
            sd(p + jnp.array([eps, 0, 0])) - sd(p - jnp.array([eps, 0, 0])),
            sd(p + jnp.array([0, eps, 0])) - sd(p - jnp.array([0, eps, 0])),
            sd(p + jnp.array([0, 0, eps])) - sd(p - jnp.array([0, 0, eps])),
        ]
    )
    return grad / (1e-9 + jnp.linalg.norm(grad))


def _camera(qp: QP, width: int, height: int):
    """Auto-frames the bodies (parity role: reference image.py:105-144)."""
    center = jnp.mean(qp.pos, axis=0)
    radius = jnp.maximum(1.0, 2.0 * jnp.max(jnp.linalg.norm(qp.pos - center, axis=-1)))
    eye = center + radius * jnp.array([1.6, -1.6, 0.9])
    fwd = center - eye
    fwd = fwd / jnp.linalg.norm(fwd)
    right = jnp.cross(fwd, jnp.array([0.0, 0.0, 1.0]))
    right = right / jnp.linalg.norm(right)
    up = jnp.cross(right, fwd)
    return eye, fwd, right, up


def render_array(
    config: Config, qp: QP, width: int = 256, height: int = 256
) -> onp.ndarray:
    """Renders one frame to an (H, W, 3) uint8 array (on device)."""
    prims = _build_prims(config)
    eye, fwd, right, up = _camera(qp, width, height)
    fov = 0.9

    xs = (jnp.arange(width) / width - 0.5) * 2 * jnp.tan(fov / 2)
    ys = (jnp.arange(height) / height - 0.5) * 2 * jnp.tan(fov / 2) * height / width
    sun = jnp.array([0.45, 0.3, 0.85])
    sun = sun / jnp.linalg.norm(sun)

    def pixel(x, y):
        direction = fwd + x * right - y * up
        direction = direction / jnp.linalg.norm(direction)
        t, idx = _march(prims, qp, eye, direction)
        hit = eye + t * direction
        n = _normal(prims, qp, hit)
        lam = jnp.clip(jnp.dot(n, sun), 0.0, 1.0)
        base = jnp.asarray(prims.color)[idx]
        # checkerboard on planes
        is_plane = jnp.asarray(prims.kind)[idx] == 3
        checker = (jnp.floor(hit[0]) + jnp.floor(hit[1])) % 2.0
        plane_col = jnp.array([0.55, 0.55, 0.6]) * (0.8 + 0.2 * checker)
        base = jnp.where(is_plane, plane_col, base)
        col = base * (0.25 + 0.75 * lam)
        sky = jnp.array([0.12, 0.13, 0.18])
        col = jnp.where(t < 100.0, col, sky)
        return jnp.clip(col, 0, 1)

    img = jax.jit(jax.vmap(jax.vmap(pixel, in_axes=(0, None)), in_axes=(None, 0)))(
        xs, ys
    )
    return onp.asarray(img * 255).astype(onp.uint8)


def render(
    config: Config,
    qps: List[QP],
    width: int = 256,
    height: int = 256,
    fmt: str = "png",
) -> bytes:
    """Renders a trajectory as PNG (single frame) or animated GIF bytes."""
    from io import BytesIO

    from PIL import Image

    frames = [Image.fromarray(render_array(config, qp, width, height)) for qp in qps]
    buf = BytesIO()
    if len(frames) == 1 or fmt == "png":
        frames[0].save(buf, format="PNG")
    else:
        frames[0].save(
            buf,
            format="GIF",
            append_images=frames[1:],
            save_all=True,
            duration=int(1000 * getattr(config, "dt", 0.033)),
            loop=0,
        )
    return buf.getvalue()
