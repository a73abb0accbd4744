"""The four-legged ant component (re-exported from the composer library).

Parity: /root/reference/brax/experimental/biggym/registry/ant/components/
ant.py — submissions may re-export existing components.
"""

from brax_tpu.composer.components import _ant as get_specs  # noqa: F401
