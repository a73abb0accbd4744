"""Collision geometry for the v2 engine (reference brax/v2/geometry)."""

from brax_tpu.v2.geometry.contact import contact
