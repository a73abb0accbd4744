"""Example BIG-Gym submission: the procedural-legged ant as a component.

Format parity: /root/reference/brax/experimental/biggym/registry/proant/.
Registering the component auto-creates race/chase/sumo track envs.
"""

AUTHORS = ("brax_tpu maintainers",)
CONTACTS = ("github.com/brax-tpu/issues",)
AFFILIATIONS = ("brax_tpu",)
DESCRIPTIONS = ("ant with a configurable number of procedurally-placed legs",)

ENVS = {}
COMPONENTS = {
    "ant": {"module": "ant:get_specs"},
}
