"""Policy parameter save/load.

Parity: /root/reference/brax/io/model.py:23-32.
"""

import pickle
from typing import Any

from brax_tpu.io import file


def save_params(path: str, params: Any):
    """Saves parameters (pickle)."""
    with file.File(path, "wb") as fout:
        fout.write(pickle.dumps(params))


def load_params(path: str) -> Any:
    """Loads parameters (pickle)."""
    with file.File(path, "rb") as fin:
        return pickle.loads(fin.read())
