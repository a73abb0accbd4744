"""Physics simulation core."""

from brax_tpu.sim import builder, config, initial, system
from brax_tpu.sim.builder import build
from brax_tpu.sim.system import System, step
from brax_tpu.sim.types import QP, DP, DQ, Contact, Info
