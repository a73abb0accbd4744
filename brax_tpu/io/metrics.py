"""TensorBoard metrics writer.

Parity: /root/reference/brax/io/metrics.py:28-53.
"""

from typing import Dict, Optional


class Writer:
    """Context-managed tensorboard writer (tensorboardX backend)."""

    def __init__(self, logdir: Optional[str] = None):
        from tensorboardX import SummaryWriter

        self._writer = SummaryWriter(logdir=logdir)

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_value, traceback):
        self._writer.close()

    def write_hparams(self, hparams: Dict[str, float]):
        self._writer.add_hparams(hparam_dict=dict(hparams), metric_dict={})

    def write_scalars(self, step: int, scalars: Dict[str, float]):
        for key, value in scalars.items():
            self._writer.add_scalar(key, value, step)
        self._writer.flush()
