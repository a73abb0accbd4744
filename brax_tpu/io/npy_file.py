"""Trajectory dump as .npy.

Parity: /root/reference/brax/io/npy_file.py.
"""

import io as _io
from typing import List

import numpy as onp

from brax_tpu.io import file
from brax_tpu.sim.types import QP


def save(path: str, qps: List[QP]):
    """Saves a trajectory of QP states as a dict-of-arrays npy."""
    data = {
        "pos": onp.stack([onp.asarray(qp.pos) for qp in qps]),
        "rot": onp.stack([onp.asarray(qp.rot) for qp in qps]),
        "vel": onp.stack([onp.asarray(qp.vel) for qp in qps]),
        "ang": onp.stack([onp.asarray(qp.ang) for qp in qps]),
    }
    buf = _io.BytesIO()
    onp.save(buf, data, allow_pickle=True)
    with file.File(path, "wb") as fout:
        fout.write(buf.getvalue())


def load(path: str):
    with file.File(path, "rb") as fin:
        return onp.load(_io.BytesIO(fin.read()), allow_pickle=True).item()
