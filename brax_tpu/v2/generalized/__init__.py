"""Generalized-coordinate dynamics pipeline (reference brax/v2/generalized)."""

from brax_tpu.v2.generalized import pipeline
from brax_tpu.v2.generalized.base import State
