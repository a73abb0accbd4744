"""On-demand build + ctypes bindings for the native rasterizer.

The shared object compiles once per source hash into
~/.cache/brax_tpu/ (g++ -O3 -shared -fPIC); `available()` is False when no
compiler is present and callers fall back to the jitted SDF path.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from typing import Optional

import numpy as onp

_SRC = os.path.join(os.path.dirname(__file__), "rasterizer.cpp")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    with open(_SRC, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:16]
    cache = os.path.join(
        os.path.expanduser("~"), ".cache", "brax_tpu"
    )
    os.makedirs(cache, exist_ok=True)
    so = os.path.join(cache, f"librasterizer_{tag}.so")
    if not os.path.exists(so):
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", so, _SRC]
        subprocess.run(cmd, check=True, capture_output=True)
    lib = ctypes.CDLL(so)
    lib.rasterize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # verts, n_verts
        ctypes.POINTER(ctypes.c_int32),                    # tris
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,      # tri_colors, n_tris
        ctypes.POINTER(ctypes.c_float),                    # view 4x4
        ctypes.c_float, ctypes.c_int, ctypes.c_int,        # fov_y, w, h
        ctypes.c_float, ctypes.c_float, ctypes.c_float,    # sky rgb
        ctypes.POINTER(ctypes.c_ubyte),                    # out
    ]
    lib.rasterize.restype = None
    return lib


def available() -> bool:
    global _lib, _tried
    if not _tried:
        _tried = True
        try:
            _lib = _build()
        except Exception:  # noqa: BLE001 - no compiler / sandboxed
            _lib = None
    return _lib is not None


def rasterize(
    verts: onp.ndarray,      # (n, 3) float32, world space
    tris: onp.ndarray,       # (f, 3) int32
    tri_colors: onp.ndarray, # (f, 3) float32 linear RGB
    view: onp.ndarray,       # (4, 4) float32 world->camera, row major
    fov_y: float,
    width: int,
    height: int,
    sky=(0.12, 0.13, 0.18),
) -> onp.ndarray:
    """Renders one frame; returns (height, width, 3) uint8."""
    assert available(), "native rasterizer unavailable"
    verts = onp.ascontiguousarray(verts, onp.float32)
    tris = onp.ascontiguousarray(tris, onp.int32)
    tri_colors = onp.ascontiguousarray(tri_colors, onp.float32)
    view = onp.ascontiguousarray(view, onp.float32)
    out = onp.empty((height, width, 3), onp.uint8)
    _lib.rasterize(
        verts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(verts),
        tris.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tri_colors.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(tris),
        view.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(fov_y),
        width,
        height,
        ctypes.c_float(sky[0]), ctypes.c_float(sky[1]), ctypes.c_float(sky[2]),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out
