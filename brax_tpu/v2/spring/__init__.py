"""Maximal-coordinate spring dynamics pipeline (reference brax/v2/spring)."""

from brax_tpu.v2.spring import pipeline
from brax_tpu.v2.spring.pipeline import State
