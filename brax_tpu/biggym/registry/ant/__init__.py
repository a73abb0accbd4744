"""Example BIG-Gym submission: the standard four-legged ant component,
entered into every goal-oriented track including the match-making ones.

Format parity: /root/reference/brax/experimental/biggym/registry/ant/.
"""

AUTHORS = ("brax_tpu maintainers",)
CONTACTS = ("github.com/brax-tpu/issues",)
AFFILIATIONS = ("brax_tpu",)
DESCRIPTIONS = ("ant with four legs",)

ENVS = {}
COMPONENTS = {
    "ant": {
        "module": "ant:get_specs",
        "tracks": (
            "race",
            "race_ma",
            "sumo",
            "onigokko_predator",
            "onigokko_prey",
        ),
    },
}
