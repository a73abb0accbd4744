"""Declarative multi-body scene composition (reference: experimental/composer)."""

from brax_tpu.composer.composer import ComponentEnv, Composer, create
from brax_tpu.composer.components import register_component
