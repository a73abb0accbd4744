"""Submission wrapper re-exporting the composer's pro_ant component."""

from brax_tpu.composer.components import _pro_ant


def get_specs(num_legs: int = 4):
    return _pro_ant(num_legs=num_legs)
