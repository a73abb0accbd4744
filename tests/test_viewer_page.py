"""Viewer page smoke tests (DOM-free: no browser/JS engine in CI).

The viewer is a self-contained WebGL renderer (brax_tpu/viewer/viewer.js) —
no three.js, no CDN — so the strongest offline checks are structural: the
generated page must be fully self-contained, the embedded trajectory JSON
must round-trip, the JS must be delimiter-balanced (catches gross syntax
breakage), and every collider type the JSON schema can emit must have a
geometry branch.  Parity targets: /root/reference/js/{viewer,animator,
selector,system}.js + /root/reference/brax/io/html.py.
"""

import json
import os
import re

import jax
import pytest

VIEWER_JS = os.path.join(
    os.path.dirname(__file__), "..", "brax_tpu", "viewer", "viewer.js"
)


@pytest.fixture(scope="module")
def page():
    from brax_tpu.envs import ant as ant_mod
    from brax_tpu.io import html

    env = ant_mod.Ant()
    state = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = jax.jit(env.step)
    qps = [state.qp]
    for _ in range(3):
        state = step(state, jax.numpy.zeros(8))
        qps.append(state.qp)
    return html.render(env.art.config, qps)


def _strip_js(src):
    """Removes string literals, template strings, and comments so delimiter
    counting can't be fooled by quoted brackets."""
    out, i, n = [], 0, len(src)
    while i < n:
        c = src[i]
        if c in "'\"`":
            q = c
            i += 1
            while i < n and src[i] != q:
                i += 2 if src[i] == "\\" else 1
            i += 1
        elif src[i : i + 2] == "//":
            while i < n and src[i] != "\n":
                i += 1
        elif src[i : i + 2] == "/*":
            j = src.find("*/", i + 2)
            i = n if j < 0 else j + 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def test_viewer_js_delimiters_balanced():
    with open(VIEWER_JS) as f:
        src = _strip_js(f.read())
    for o, c in [("{", "}"), ("(", ")"), ("[", "]")]:
        assert src.count(o) == src.count(c), f"unbalanced {o}{c}"


def test_viewer_js_covers_all_collider_types():
    """Every collider type io/json.py can emit has a branch in the viewer."""
    with open(VIEWER_JS) as f:
        src = f.read()
    for key in ["capsule", "sphere", "box", "plane", "clippedPlane",
                "heightMap", "mesh", "contact_pos", "contact_penetration"]:
        assert f"col.{key}" in src or f"system.{key}" in src, key


def test_viewer_js_feature_surface():
    """Reference-parity features (js/animator.js scrubber+speed,
    js/selector.js hover/select, lil-gui body readouts) exist by name."""
    with open(VIEWER_JS) as f:
        src = f.read()
    for sym in ["startViewer", "OrbitControls", "function pick",
                "speedSel", "slider", "toDataURL", "debugChk", "select("]:
        assert sym in src, sym


def test_page_is_self_contained(page):
    # no external resource loads of any kind
    assert "http://" not in page and "https://" not in page
    assert "<script src=" not in page
    # embedded viewer + scene
    assert "startViewer" in page


def test_page_trajectory_roundtrip(page):
    m = re.search(r"const system = (\{.*?\});</script>", page, re.S)
    assert m, "embedded system JSON not found"
    system = json.loads(m.group(1))
    assert len(system["pos"]) == len(system["rot"]) == 4
    n_bodies = len(system["config"]["bodies"])
    assert n_bodies >= 9  # ant: torso + 8 limb segments + ground
    assert len(system["pos"][0]) == n_bodies
    assert len(system["rot"][0][0]) == 4  # (w, x, y, z)
    assert system["config"]["dt"] > 0
