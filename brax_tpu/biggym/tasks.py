"""Goal-oriented task tracks over registered components.

Each task factory takes a component name and returns an env constructor
built on the composer.  Parity: /root/reference/brax/experimental/biggym/
tasks.py (race/sumo-style tracks).
"""

from __future__ import annotations

import functools
from typing import Callable


def race(component: str) -> Callable:
    """Single-agent: run in +x as fast as possible."""

    def make(**kwargs):
        from brax_tpu import composer

        return composer.create(
            components=dict(
                agent1=dict(
                    component=component,
                    reward_fns=dict(
                        race=dict(reward_type="forward_velocity", weight=1.0),
                        ctrl=dict(reward_type="ctrl_cost", weight=0.01),
                    ),
                ),
            ),
            **kwargs,
        )

    return make


def chase(component: str) -> Callable:
    """Symmetric two-agent: each is rewarded for closing distance."""

    def make(**kwargs):
        from brax_tpu import composer

        return composer.create(
            components=dict(
                agent1=dict(component=component, pos=(0.0, 2.0, 0.0)),
                agent2=dict(component=component, pos=(0.0, -2.0, 0.0)),
            ),
            edges={
                "agent1__agent2": dict(
                    collide_type="root",
                    reward_fns=dict(chase=dict(reward_type="chase")),
                )
            },
            agent_groups=dict(
                agent1=dict(
                    action_agents=("agent1",),
                    reward_names=("chase__agent1__agent2",),
                ),
                agent2=dict(
                    action_agents=("agent2",),
                    reward_names=("chase__agent1__agent2",),
                ),
            ),
            **kwargs,
        )

    return make


def sumo(component: str) -> Callable:
    """Symmetric two-agent contact task: push the opponent away from center."""

    def make(**kwargs):
        from brax_tpu import composer

        return composer.create(
            components=dict(
                agent1=dict(component=component, pos=(0.0, 1.5, 0.0)),
                agent2=dict(component=component, pos=(0.0, -1.5, 0.0)),
            ),
            edges={
                "agent1__agent2": dict(
                    collide_type="full",
                    reward_fns=dict(
                        push=dict(reward_type="distance", weight=-1.0)
                    ),
                )
            },
            agent_groups=dict(
                agent1=dict(
                    action_agents=("agent1",),
                    reward_names=("push__agent1__agent2",),
                ),
                agent2=dict(
                    action_agents=("agent2",),
                    reward_names=("push__agent1__agent2",),
                ),
            ),
            **kwargs,
        )

    return make


TASKS = {
    "race": race,
    "chase": chase,
    "sumo": sumo,
}
SYMMETRIC_MA_TASKS = ("chase", "sumo")
