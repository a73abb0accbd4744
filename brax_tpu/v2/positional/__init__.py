"""Position-based dynamics pipeline on v2 types.

The reference's positional pipeline is an unimplemented stub
(brax/v2/positional/pipeline.py:39-43, `# TODO: implement`); this one is a
working XPBD-style solver: kinetic integration, position-level joint
projection, position+velocity contact resolution, velocity back-projection.
"""

from brax_tpu.v2.positional import pipeline
from brax_tpu.v2.positional.pipeline import State
