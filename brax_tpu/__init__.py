"""brax_tpu: a TPU-native differentiable rigid-body physics engine + RL stack.

A ground-up JAX/XLA re-design with the capabilities of the reference Brax
fork: batched PBD/spring physics, a MuJoCo-style environment suite, and
fully-on-device RL trainers (PPO/SAC/ES/ARS/APG) sharded over TPU meshes.
"""

__version__ = "0.1.0"

from brax_tpu import maths
from brax_tpu.sim.types import QP, DP, DQ, Contact, Info
from brax_tpu.sim.config import Config
from brax_tpu.sim.system import System
