"""Composer env-description registry.

`ENV_DESCS` maps task names to desc factories; `create_ma_env` builds a
wrapped environment from one.  Role parity:
/root/reference/brax/experimental/composer/envs/__init__.py.
"""

from brax_tpu.composer.envs import ma_descs
from brax_tpu.composer.envs.ma_descs import ENV_DESCS, create_desc


def create_ma_env(task: str = "chase", episode_length=1000, action_repeat=1,
                  batch_size=None, auto_reset=True, **desc_kwargs):
    """Builds a multi-agent composed env from a registered task desc."""
    from brax_tpu import composer

    desc = ENV_DESCS[task](**desc_kwargs)
    return composer.create(
        components=desc["components"],
        edges=desc.get("edges"),
        agent_groups=desc.get("agent_groups"),
        episode_length=episode_length,
        action_repeat=action_repeat,
        batch_size=batch_size,
        auto_reset=auto_reset,
    )
