"""Standalone HTML trajectory viewer.

Embeds the scene/trajectory JSON and our WebGL viewer
(brax_tpu/viewer/viewer.js) into one fully self-contained page — no CDN,
no external dependencies, works offline (the reference page requires
three.js from a CDN).  Parity: /root/reference/brax/io/html.py:26-104.
"""

import os
from typing import List, Optional

from brax_tpu.io import file
from brax_tpu.io import json as io_json
from brax_tpu.sim.config import Config
from brax_tpu.sim.types import Info, QP

_VIEWER_JS = os.path.join(os.path.dirname(__file__), "..", "viewer", "viewer.js")

_PAGE = """<!DOCTYPE html>
<html>
<head>
  <meta charset="utf-8"/>
  <title>brax_tpu viewer</title>
  <style>
    html, body {{ margin: 0; padding: 0; background: #11131a; }}
    #brax-tpu-viewer {{ width: 100vw; height: 95vh; }}
  </style>
</head>
<body>
  <div id="brax-tpu-viewer"></div>
  <script>const system = {system_json};</script>
  <script>{viewer_js}</script>
</body>
</html>
"""


def render(
    config: Config, qps: List[QP], info: Optional[List[Info]] = None
) -> str:
    """Returns an HTML page that visualizes the trajectory."""
    with open(_VIEWER_JS) as f:
        viewer_js = f.read()
    return _PAGE.format(system_json=io_json.dumps(config, qps, info), viewer_js=viewer_js)


def save_html(
    path: str, config: Config, qps: List[QP], info: Optional[List[Info]] = None
):
    """Saves a standalone viewer HTML page."""
    with file.File(path, "w") as fout:
        fout.write(render(config, qps, info))
