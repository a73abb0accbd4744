"""Serialization + HTML viewer for v2 systems and trajectories.

Role parity: reference brax/v2/io/{json,html}.py.  Emits the same viewer
JSON schema as brax_tpu.io.json (bodies with colliders + pos/rot frames), so
the existing three.js viewer (brax_tpu/viewer/viewer.js) renders v2 scenes
unchanged.
"""

from __future__ import annotations

import json
from typing import List

import numpy as onp

from brax_tpu.io import file as io_file
from brax_tpu.io.html import _PAGE, _VIEWER_JS
from brax_tpu.v2.base import Box, Capsule, Mesh, Plane, Sphere, State, System


def _geom_dict(g, i: int) -> dict:
    pos = onp.asarray(g.transform.pos).tolist()
    rot = _quat_to_euler_deg(onp.asarray(g.transform.rot))
    d: dict = {"position": pos, "rotation": rot}
    if isinstance(g, Capsule):
        d["capsule"] = {"radius": float(g.radius), "length": float(g.length) + 2 * float(g.radius)}
    elif isinstance(g, Sphere):
        d["sphere"] = {"radius": float(g.radius)}
    elif isinstance(g, Box):
        d["box"] = {"halfsize": onp.asarray(g.halfsize).tolist()}
    elif isinstance(g, Plane):
        d["plane"] = {}
    elif isinstance(g, Mesh):
        d["mesh"] = {"name": f"mesh_{i}", "scale": 1.0}
    return d


def _quat_to_euler_deg(q) -> List[float]:
    """wxyz quaternion -> intrinsic xyz euler degrees (viewer convention)."""
    import numpy as np

    w, x, y, z = q
    ex = np.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    ey = np.arcsin(np.clip(2 * (w * y - z * x), -1, 1))
    ez = np.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return [float(np.degrees(v)) for v in (ex, ey, ez)]


def dumps(sys: System, states: List[State]) -> str:
    """Serializes a v2 System + state trajectory to viewer JSON."""
    n = sys.num_links()
    bodies = []
    meshes = {}
    for li in range(n):
        colliders = []
        for gi, g in enumerate(sys.geoms):
            if g.link_idx is not None and int(g.link_idx) == li:
                colliders.append(_geom_dict(g, gi))
                if isinstance(g, Mesh):
                    meshes[f"mesh_{gi}"] = {
                        "vertices": onp.asarray(g.vert).tolist(),
                        "faces": onp.asarray(g.face).reshape(-1).tolist(),
                    }
        bodies.append({"name": sys.link_names[li], "colliders": colliders})
    # one extra world "body" carrying static geoms (floor planes etc.)
    world_colliders = [
        _geom_dict(g, gi)
        for gi, g in enumerate(sys.geoms)
        if g.link_idx is None
    ]
    if world_colliders:
        bodies.append({"name": "world", "colliders": world_colliders})

    pos = [onp.asarray(s.x.pos) for s in states]
    rot = [onp.asarray(s.x.rot) for s in states]
    if world_colliders:
        zero = onp.zeros((len(pos[0]) + 1, 3))
        ident = onp.tile(onp.array([1.0, 0, 0, 0]), (len(rot[0]) + 1, 1))
        pos = [onp.concatenate([p, zero[-1:]]) for p in pos]
        rot = [onp.concatenate([r, ident[-1:]]) for r in rot]

    d = {
        "config": {
            "bodies": bodies,
            "meshGeometries": meshes,
            "dt": float(sys.dt),
        },
        "pos": [p.tolist() for p in pos],
        "rot": [r.tolist() for r in rot],
        "debug": False,
    }
    return json.dumps(d)


def render_html(sys: System, states: List[State]) -> str:
    """Standalone HTML page visualizing a v2 trajectory."""
    with open(_VIEWER_JS) as f:
        viewer_js = f.read()
    return _PAGE.format(system_json=dumps(sys, states), viewer_js=viewer_js)


def save_html(path: str, sys: System, states: List[State]):
    with io_file.File(path, "w") as fout:
        fout.write(render_html(sys, states))
