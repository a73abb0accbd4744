"""Execute viewer/viewer.js (VERDICT r4 weak item 5).

No JS runtime exists in this sandbox, so tests/js_mini.py provides a
minimal interpreter; these tests actually EVALUATE the viewer's
math/geometry/scene-graph half against a recorded ant system JSON and
assert numerical invariants — replacing the old delimiter/feature greps
(test_viewer_page.py keeps covering the page assembly itself).

Reference capability bar: /root/reference/js/system.js (geometry
creation from system JSON), /root/reference/js/animator.js (per-frame
body transforms).
"""

import json
import math

import numpy as np
import pytest

import jax

from tests import js_mini

VIEWER = "brax_tpu/viewer/viewer.js"


@pytest.fixture(scope="module")
def interp():
    with open(VIEWER) as f:
        src = f.read()
    return js_mini.Interp().run(src)


@pytest.fixture(scope="module")
def ant_system():
    """Recorded 3-frame random-action ant trajectory as the viewer's
    `system` JSON object."""
    import jax.numpy as jnp

    from brax_tpu import envs
    from brax_tpu.io import json as io_json

    env = envs.create("ant", auto_reset=False)
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    qps = [state.qp]
    step = jax.jit(env.step)
    for i in range(2):
        act = 0.5 * jax.random.uniform(
            jax.random.fold_in(jax.random.PRNGKey(1), i), (env.action_size,)
        )
        state = step(state, act)
        qps.append(state.qp)
    sys_cfg = env.unwrapped.art.config
    return json.loads(io_json.dumps(sys_cfg, qps)), qps


class MockRenderer:
    """Stands in for the WebGL Renderer: upload() just records geometry."""

    def __init__(self):
        self.uploads = []

    def js(self):
        def upload(args, this=None):
            g = args[0]
            self.uploads.append(g)
            return g

        return js_mini.JSObject(upload=upload)


def test_mat4_math(interp):
    ident = interp.call("mat4Identity")
    assert ident == [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
    # mat4Mul(I, M) == M
    m = list(range(16))
    assert interp.call("mat4Mul", ident, m) == [float(x) for x in m]
    # quat (w,x,y,z) for 90 deg about z, applied at position p
    q = interp.call("quatFromEulerXYZ", 0.0, 0.0, 90.0)
    np.testing.assert_allclose(
        q, [math.sqrt(0.5), 0, 0, math.sqrt(0.5)], atol=1e-12
    )
    m4 = np.array(interp.call("mat4FromQuatPos", q, [1.0, 2.0, 3.0])).reshape(4, 4).T
    # column-major: rotation maps x->y, translation in last column
    np.testing.assert_allclose(m4[:3, 3], [1, 2, 3], atol=1e-12)
    np.testing.assert_allclose(m4[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-9)


def test_geometry_builders(interp):
    box = interp.call("geoBox", 0.5, 1.0, 2.0)
    assert len(box["positions"]) == 24 * 3  # 6 faces x 4 verts
    assert len(box["indices"]) == 36
    p = np.array(box["positions"]).reshape(-1, 3)
    assert np.allclose(np.abs(p).max(axis=0), [0.5, 1.0, 2.0])

    cap = interp.call("geoCapsule", 0.25, 1.0, 8, 4)
    pos = np.array(cap["positions"]).reshape(-1, 3)
    nrm = np.array(cap["normals"]).reshape(-1, 3)
    # all normals unit
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=1), 1.0, atol=1e-6)
    # capsule bounds: radius in xy, half-length in z
    assert np.abs(pos[:, :2]).max() <= 0.25 + 1e-6
    assert np.abs(pos[:, 2]).max() == pytest.approx(0.5, abs=1e-6)

    grid = interp.call("geoGrid", 4.0, 2, None)
    assert len(grid["positions"]) == 9 * 3
    assert len(grid["indices"]) == 2 * 2 * 6
    # flat grid normals all +z
    n = np.array(grid["normals"]).reshape(-1, 3)
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (9, 1)))

    tm = interp.call(
        "geoTrimesh",
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]],
        [0, 1, 2],
        2.0,
    )
    p = np.array(tm["positions"]).reshape(-1, 3)
    np.testing.assert_allclose(p[1], [2, 0, 0])  # scale applied
    n = np.array(tm["normals"]).reshape(-1, 3)
    np.testing.assert_allclose(n, np.tile([0, 0, 1.0], (3, 1)), atol=1e-6)


def test_build_scene_from_recorded_ant(interp, ant_system):
    system, _ = ant_system
    mock = MockRenderer()
    scene = js_mini.to_py(
        interp.global_scope.get("buildScene").call(
            [js_mini.to_js(system), mock.js()]
        )
    )
    cfg_bodies = system["config"]["bodies"]
    assert len(scene["bodies"]) == len(cfg_bodies)
    names = [b["name"] for b in scene["bodies"]]
    assert names == [b.get("name") for b in cfg_bodies]
    # every non-hidden collider produced a draw with a 16-float local mat
    for body, cfg in zip(scene["bodies"], cfg_bodies):
        n_vis = sum(1 for c in cfg.get("colliders", []) if not c.get("hidden"))
        assert len(body["draws"]) == n_vis
        for d in body["draws"]:
            assert len(d["local"]) == 16
    # ant: 1 torso + 4x(2 segments) bodies + ground
    assert any("floor" in n.lower() or "ground" in n.lower() for n in names) or len(
        names
    ) >= 9
    # uploads happened through the renderer (incl. contact dot + axis)
    assert len(mock.uploads) >= sum(len(b["draws"]) for b in scene["bodies"]) + 2


def test_set_frame_places_bodies(interp, ant_system):
    system, qps = ant_system
    mock = MockRenderer()
    scene_js = interp.global_scope.get("buildScene").call(
        [js_mini.to_js(system), mock.js()]
    )
    for t in (0, 2):
        interp.global_scope.get("setFrame").call(
            [js_mini.to_js(system), scene_js, float(t)]
        )
        scene = js_mini.to_py(scene_js)
        ref_pos = np.asarray(qps[t].pos)
        ref_rot = np.asarray(qps[t].rot)
        for i, b in enumerate(scene["bodies"]):
            np.testing.assert_allclose(b["pos"], ref_pos[i], atol=1e-5)
            np.testing.assert_allclose(b["rot"], ref_rot[i], atol=1e-5)
            m = np.array(b["model"]).reshape(4, 4).T
            # translation column = body position
            np.testing.assert_allclose(m[:3, 3], ref_pos[i], atol=1e-5)
            # rotation block orthonormal with det +1
            R = m[:3, :3]
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(R) == pytest.approx(1.0, abs=1e-5)


def test_lookat_and_perspective(interp):
    view = np.array(
        interp.call("mat4LookAt", [0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 1.0, 0.0])
    ).reshape(4, 4).T
    # camera at (0,0,5) looking at origin: origin maps to (0,0,-5)
    p = view @ np.array([0, 0, 0, 1.0])
    np.testing.assert_allclose(p[:3], [0, 0, -5], atol=1e-6)
    proj = np.array(interp.call("mat4Perspective", 60.0, 1.5, 0.1, 100.0)).reshape(
        4, 4
    ).T
    assert proj[3, 2] == -1.0  # perspective divide row
    assert proj[0, 0] == pytest.approx(proj[1, 1] / 1.5)


def test_top_level_guard_is_dom_free(interp):
    """The file's only top-level side effect is guarded by `typeof window`;
    running it with no DOM must define the API without executing UI code."""
    for name in ("startViewer", "buildScene", "setFrame", "OrbitControls",
                 "Renderer"):
        assert interp.global_scope.has(name), name
